"""Residual-saving policy for the fused attention backward.

The fused attention backward originally rematerialized the QKV
projection per image — the single largest recompute dot in the step
(~60% of the attention backward's extra MACs; part of the measured
49.3% train vs 59.6% infer MFU gap, BENCH_r03).  The tensor it
reproduces is exactly the forward's own intermediate, so when HBM
affords it the forward saves the fused qkv rows (B, N, 3*C_local) in
the compute dtype instead — bit-identical to the rematerialized value,
since the remat produced the same dot followed by the same cast.
Measured on v5e at ViT-S/16 b512: 6.45 -> 5.93 ms per block fwd+bwd.

(The fused MLP was measured with the same treatment and KEEPS remat:
streaming its 4x-wider pre-GELU residual costs more than the fc1
recompute it saves — see ops/fused_mlp.py module docstring.)

Budget model: a kernel call estimates the whole-model cost of its own
residual as depth x one layer and saves when that estimate fits the
budget (default 4 GiB, which alongside the ~3 GiB of existing x/ctx
residuals and optimizer state stays under a 16 GiB v5e chip at ViT-S
batch 512 / ViT-B batch 256; at batch 1024 the gate turns saving off).
The model passes its real ``depth`` down (models/vit.py Block ->
fused_attention_block); a caller that cannot know it (direct kernel
microbenches) gets the reference family's uniform depth 12
(classification/train_configs/*.json) as the fallback.

Env overrides (read at trace time):
  MVT_SAVE_ACTS=0|1     force off / force on (bypasses the budget)
  MVT_SAVE_ACTS_GB=<f>  per-kernel budget in GiB (default 4.0)
"""
from __future__ import annotations

import os

_FALLBACK_DEPTH = 12


def save_acts(extra_bytes_per_layer: int, depth: int | None = None) -> bool:
    """Whether a fused kernel should save its projection rows for the
    backward instead of rematerializing them.

    ``extra_bytes_per_layer``: bytes of the residual ONE kernel call
    would add (batch * rows * width * itemsize).  ``depth``: the
    model's real layer count (None -> reference-family fallback 12).
    """
    env = os.environ.get("MVT_SAVE_ACTS")
    if env is not None and env != "auto":
        return env == "1"
    budget_gb = float(os.environ.get("MVT_SAVE_ACTS_GB", 4.0))
    n_layers = depth if depth else _FALLBACK_DEPTH
    return n_layers * extra_bytes_per_layer <= budget_gb * (1 << 30)
