"""CNN zoo forwards vs a torch-functional oracle executing the SAME
state dict (catches layout, grouping, BN, and pooling mismatches between
the JAX forwards and torch semantics)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from myrtle_vision_tpu.models.cnn import (
    CNN_ARCHS,
    cnn_apply_torch_sd,
    random_cnn_state_dict,
)
from myrtle_vision_tpu.models.cnn import (
    _MBV2_SETTING,
    _MNAS_STACKS,
    _SHUFFLE_STAGES,
    _SQUEEZE_CFG,
)


def t(sd, k):
    return torch.from_numpy(np.asarray(sd[k]))


def conv(sd, name, x, stride=1, pad=0, groups=1):
    bias = t(sd, f"{name}.bias") if f"{name}.bias" in sd else None
    return F.conv2d(x, t(sd, f"{name}.weight"), bias, stride, pad,
                    groups=groups)


def bn(sd, name, x):
    return F.batch_norm(
        x, t(sd, f"{name}.running_mean"), t(sd, f"{name}.running_var"),
        t(sd, f"{name}.weight"), t(sd, f"{name}.bias"), False, 0.1, 1e-5,
    )


def torch_squeezenet(sd, x, arch):
    cfg = _SQUEEZE_CFG[arch]
    pools = set(cfg["pools"])
    fires = {i: rest for i, *rest in cfg["fires"]}
    x = F.relu(conv(sd, "features.0", x, cfg["stem"][1]))
    for i in range(1, 13):
        if i in pools:
            x = F.max_pool2d(x, 3, 2, ceil_mode=True)
        elif i in fires:
            p = f"features.{i}"
            s = F.relu(conv(sd, f"{p}.squeeze", x))
            e1 = F.relu(conv(sd, f"{p}.expand1x1", s))
            e3 = F.relu(conv(sd, f"{p}.expand3x3", s, pad=1))
            x = torch.cat([e1, e3], dim=1)
    x = F.relu(conv(sd, "classifier.1", x))
    return x.mean(dim=(2, 3))


def torch_mobilenet_v2(sd, x):
    x = F.relu6(bn(sd, "features.0.1", conv(sd, "features.0.0", x, 2, 1)))
    cin, idx = 32, 1
    for t_, c, n, s in _MBV2_SETTING:
        for rep in range(n):
            stride = s if rep == 0 else 1
            p = f"features.{idx}.conv"
            identity = x
            if t_ == 1:
                h = F.relu6(bn(sd, f"{p}.0.1",
                               conv(sd, f"{p}.0.0", x, stride, 1,
                                    groups=cin)))
                x = bn(sd, f"{p}.2", conv(sd, f"{p}.1", h))
            else:
                h = F.relu6(bn(sd, f"{p}.0.1", conv(sd, f"{p}.0.0", x)))
                h = F.relu6(bn(sd, f"{p}.1.1",
                               conv(sd, f"{p}.1.0", h, stride, 1,
                                    groups=cin * t_)))
                x = bn(sd, f"{p}.3", conv(sd, f"{p}.2", h))
            if stride == 1 and cin == c:
                x = x + identity
            cin = c
            idx += 1
    x = F.relu6(bn(sd, "features.18.1", conv(sd, "features.18.0", x)))
    x = x.mean(dim=(2, 3))
    return F.linear(x, t(sd, "classifier.1.weight"),
                    t(sd, "classifier.1.bias"))


def torch_mnasnet(sd, x):
    x = F.relu(bn(sd, "layers.1", conv(sd, "layers.0", x, 2, 1)))
    x = F.relu(bn(sd, "layers.4", conv(sd, "layers.3", x, 1, 1,
                                       groups=32)))
    x = bn(sd, "layers.7", conv(sd, "layers.6", x))
    for stack_i, (cin, cout, k, s, t_, reps) in enumerate(
        _MNAS_STACKS, start=8
    ):
        for rep in range(reps):
            stride = s if rep == 0 else 1
            ci = cin if rep == 0 else cout
            p = f"layers.{stack_i}.{rep}.layers"
            identity = x
            h = F.relu(bn(sd, f"{p}.1", conv(sd, f"{p}.0", x)))
            h = F.relu(bn(sd, f"{p}.4",
                          conv(sd, f"{p}.3", h, stride, k // 2,
                               groups=ci * t_)))
            x = bn(sd, f"{p}.7", conv(sd, f"{p}.6", h))
            if stride == 1 and ci == cout:
                x = x + identity
    x = F.relu(bn(sd, "layers.15", conv(sd, "layers.14", x)))
    x = x.mean(dim=(2, 3))
    return F.linear(x, t(sd, "classifier.1.weight"),
                    t(sd, "classifier.1.bias"))


def torch_shufflenet(sd, x):
    def shuffle(v):
        b, c, h, w = v.shape
        return (v.view(b, 2, c // 2, h, w).transpose(1, 2)
                .reshape(b, c, h, w))

    x = F.relu(bn(sd, "conv1.1", conv(sd, "conv1.0", x, 2, 1)))
    x = F.max_pool2d(x, 3, 2, 1)
    for stage, cin, cout, reps in _SHUFFLE_STAGES:
        half = cout // 2
        for rep in range(reps):
            p = f"{stage}.{rep}"
            if rep == 0:
                b1 = bn(sd, f"{p}.branch1.1",
                        conv(sd, f"{p}.branch1.0", x, 2, 1, groups=cin))
                b1 = F.relu(bn(sd, f"{p}.branch1.3",
                               conv(sd, f"{p}.branch1.2", b1)))
                b2 = F.relu(bn(sd, f"{p}.branch2.1",
                               conv(sd, f"{p}.branch2.0", x)))
                b2 = bn(sd, f"{p}.branch2.4",
                        conv(sd, f"{p}.branch2.3", b2, 2, 1, groups=half))
                b2 = F.relu(bn(sd, f"{p}.branch2.6",
                               conv(sd, f"{p}.branch2.5", b2)))
            else:
                b1, inp = x[:, :half], x[:, half:]
                b2 = F.relu(bn(sd, f"{p}.branch2.1",
                               conv(sd, f"{p}.branch2.0", inp)))
                b2 = bn(sd, f"{p}.branch2.4",
                        conv(sd, f"{p}.branch2.3", b2, 1, 1, groups=half))
                b2 = F.relu(bn(sd, f"{p}.branch2.6",
                               conv(sd, f"{p}.branch2.5", b2)))
            x = shuffle(torch.cat([b1, b2], dim=1))
    x = F.relu(bn(sd, "conv5.1", conv(sd, "conv5.0", x)))
    x = x.mean(dim=(2, 3))
    return F.linear(x, t(sd, "fc.weight"), t(sd, "fc.bias"))


_ORACLE = {
    "squeezenet1_0": lambda sd, x: torch_squeezenet(sd, x,
                                                    "squeezenet1_0"),
    "squeezenet1_1": lambda sd, x: torch_squeezenet(sd, x,
                                                    "squeezenet1_1"),
    "mobilenet_v2": torch_mobilenet_v2,
    "mnasnet1_0": torch_mnasnet,
    "shufflenet_v2_x1_0": torch_shufflenet,
}


@pytest.mark.parametrize("arch", sorted(CNN_ARCHS))
def test_matches_torch_oracle(arch):
    sd = random_cnn_state_dict(arch, num_classes=7, seed=3)
    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)

    ours = np.asarray(cnn_apply_torch_sd(sd, imgs, arch))
    theirs = (
        _ORACLE[arch](sd, torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        .detach().numpy()
    )
    assert ours.shape == (2, 7)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_unknown_arch_raises():
    with pytest.raises(ValueError, match="unknown arch"):
        cnn_apply_torch_sd({}, np.zeros((1, 32, 32, 3)), "vgg16")


def test_train_mode_returns_stats():
    sd = random_cnn_state_dict("mobilenet_v2", 4, seed=0)
    imgs = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    logits, stats = cnn_apply_torch_sd(sd, imgs, "mobilenet_v2",
                                       train=True)
    assert logits.shape == (2, 4)
    assert any(k.endswith("running_mean") for k in stats)
