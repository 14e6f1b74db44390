"""torchvision.models shim — import surface only."""


def resnet50(num_classes=1000, **kwargs):
    raise RuntimeError(
        "torchvision shim: CNN model zoo is unavailable in this offline "
        "environment; the distillation-teacher control cannot run here"
    )


def resnet18(num_classes=1000, **kwargs):
    raise RuntimeError("torchvision shim: see resnet50")
