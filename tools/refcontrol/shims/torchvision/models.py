"""torchvision.models shim.

``resnet50`` is a real torch implementation of torchvision's ResNet-50
(V1.5: the 3x3 conv carries the stride) with torchvision's exact module
naming, so state dicts are interchangeable with torchvision checkpoints
and with the JAX teacher (myrtle_vision_tpu/models/resnet.py uses the
same key layout).  Needed by the reference's distillation control:
``get_teacher`` builds ``resnet50(num_classes)`` and loads finetuned
weights (reference src/myrtle_vision/utils/models.py:14-22).

Architecture facts mirrored from the torchvision source (standard,
publicly documented): conv1 7x7/2 pad 3 -> bn -> relu -> maxpool 3x3/2
pad 1 -> layers of Bottleneck blocks [3, 4, 6, 3] (expansion 4, stride
on the first block of layers 2-4, 1x1 downsample shortcut) ->
AdaptiveAvgPool2d(1) -> fc.
"""
import torch
from torch import nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(
            planes, planes, 3, stride=stride, padding=1, bias=False
        )
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(
            planes, planes * self.expansion, 1, bias=False
        )
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(
            3, 64, 7, stride=2, padding=3, bias=False
        )
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * Bottleneck.expansion, num_classes)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        out_planes = planes * Bottleneck.expansion
        if stride != 1 or self.inplanes != out_planes:
            downsample = nn.Sequential(
                nn.Conv2d(
                    self.inplanes, out_planes, 1, stride=stride,
                    bias=False,
                ),
                nn.BatchNorm2d(out_planes),
            )
        layers = [
            Bottleneck(self.inplanes, planes, stride, downsample)
        ]
        self.inplanes = out_planes
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet50(num_classes=1000, **kwargs):
    return ResNet([3, 4, 6, 3], num_classes=num_classes)


def resnet18(num_classes=1000, **kwargs):
    raise RuntimeError(
        "torchvision shim: only resnet50 (the reference's distillation "
        "teacher, utils/models.py:16) is implemented"
    )
