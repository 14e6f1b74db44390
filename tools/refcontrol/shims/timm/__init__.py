"""Minimal timm shim for running the reference stack as an accuracy
control (timm is not installable in this image).

Provides exactly the surface the reference uses:
  - timm.optim.create_optimizer   (classification/train.py:11,163)
  - timm.scheduler.create_scheduler (classification/train.py:12,166)
  - timm.create_model             (utils/models.py:205 — pretrained
    download; unavailable without network egress, raises if called)

The optimizer/scheduler semantics mirror timm's published behavior (AdamW
with bias/1-D params excluded from weight decay; per-epoch cosine schedule
with linear warmup and optional multiplicative noise) and are the same
semantics this framework's optax port implements
(myrtle_vision_tpu/training/optim.py).
"""
from . import optim, scheduler  # noqa: F401


def create_model(name, pretrained=False, **kwargs):
    raise RuntimeError(
        "timm shim: pretrained model download is unavailable in this "
        "offline environment (no network egress)"
    )
