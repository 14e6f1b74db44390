"""Minimal torchvision shim for running the reference stack as an
accuracy control (torchvision is not installable in this image).

Surface used by the reference classification stack:
  - torchvision.transforms: Compose / Resize / RandomResizedCrop /
    CenterCrop / RandomHorizontalFlip / ToTensor / Normalize
    (datasets/resisc45.py:39-69)
  - torchvision.models.resnet50 (utils/models.py:6,16 — distillation
    teacher; module must import, the function raises if called since
    pretrained CNN weights aren't available offline)

Transform semantics follow torchvision's documented behavior (PIL
bilinear resize, area/ratio-sampled RandomResizedCrop with central
fallback, torch-RNG randomness so seed_everything applies).
"""
from . import datasets, models, ops, transforms  # noqa: F401


def _is_tracing():
    """torchvision._is_tracing (reference transforms/detection.py:62) —
    always False outside torch.jit tracing."""
    return False
