"""Hungarian matching between detection predictions and padded targets.

DETR-style bipartite matching (reference: src/myrtle_vision/models/
matcher.py): cost = cost_bbox * L1 + cost_class * (-prob[target]) +
cost_giou * (-GIoU).  The reference moves the cost matrix to CPU and runs
scipy's ``linear_sum_assignment`` per image (matcher.py:83-87); that step is
inherently host-side and data-dependent, so it is expressed as a
``jax.pure_callback`` from inside the jitted loss — the cost matrix itself
is computed on-device (jnp, batched) under ``stop_gradient``.

TPU adaptation: targets are padded to a static ``max_boxes`` with a
validity mask (XLA needs static shapes; the reference's ragged per-image
target lists would recompile every step).  The result is, per target slot
``m``, the matched query index ``src[b, m]`` (meaningful where
``tgt_valid[b, m]``) — equivalent information to the reference's
(index_i, index_j) tuples.

The LSAP solve has three interchangeable exact backends:
  - on-device jittable Hungarian (ops/lsap_device.py) — the accelerator
    default: no host sync, works on PJRT plugins without callback support;
  - native C++ Jonker-Volgenant (native/lsap.cpp) via pure_callback;
  - scipy via pure_callback (fallback).
Select with MVT_MATCHER=host|device (default: auto).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    generalized_box_iou,
)

_BIG = 1e8


def _use_device_matcher() -> bool:
    """Matching backend: MVT_MATCHER=host|device overrides; default is the
    on-device exact Hungarian (ops/lsap_device.py) on accelerators — no
    host sync, and some PJRT plugins (this container's tunneled TPU
    included) don't support host callbacks at all — and the host
    scipy/C++ solver on CPU (bit-parity with the reference's scipy path).
    """
    import os

    choice = os.environ.get("MVT_MATCHER", "auto")
    if choice == "host":
        return False
    if choice == "device":
        return True
    return jax.default_backend() != "cpu"


def _solve_lsap(cost: np.ndarray) -> tuple:
    """Solve one LSAP (rows=queries, cols=targets, rows >= cols).
    Returns (row_idx, col_idx) arrays of length cols."""
    from myrtle_vision_tpu.native import lsap as native_lsap

    if native_lsap.available():
        return native_lsap.solve(cost)
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(cost)


def _match_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Per-image LSAP on the first n_valid[b] columns; returns (B, M) int32
    of query indices per target slot (0 for invalid slots)."""
    cost = np.asarray(cost, np.float64)
    n_valid = np.asarray(n_valid)
    B, Q, M = cost.shape
    src = np.zeros((B, M), np.int32)
    for b in range(B):
        m = int(n_valid[b])
        if m == 0:
            continue
        rows, cols = _solve_lsap(cost[b, :, :m])
        src[b, cols] = rows.astype(np.int32)
    return src


def hungarian_match(
    pred_logits,
    pred_boxes,
    tgt_labels,
    tgt_boxes,
    tgt_valid,
    cost_class: float = 1.0,
    cost_bbox: float = 1.0,
    cost_giou: float = 1.0,
):
    """Batched matching.

    Args:
      pred_logits: (B, Q, C+1) raw logits.
      pred_boxes: (B, Q, 4) cxcywh in [0,1].
      tgt_labels: (B, M) int class ids (padded).
      tgt_boxes: (B, M, 4) cxcywh normalized (padded).
      tgt_valid: (B, M) bool.

    Returns:
      src_idx: (B, M) int32 — matched query per valid target slot.
    """
    pred_logits = jax.lax.stop_gradient(pred_logits)
    pred_boxes = jax.lax.stop_gradient(pred_boxes)

    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    # cost_class[b,q,m] = -prob[b,q,tgt_labels[b,m]]
    c_class = -jnp.take_along_axis(
        prob,
        tgt_labels[:, None, :].astype(jnp.int32) * jnp.ones(
            (1, prob.shape[1], 1), jnp.int32
        ),
        axis=-1,
    )
    # L1 cdist
    c_bbox = jnp.sum(
        jnp.abs(pred_boxes[:, :, None, :] - tgt_boxes[:, None, :, :]),
        axis=-1,
    )
    c_giou = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    cost = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou
    cost = jnp.where(tgt_valid[:, None, :], cost, _BIG)
    # NaN/inf guard (degenerate boxes) so LSAP stays solvable
    cost = jnp.nan_to_num(cost, nan=_BIG, posinf=_BIG, neginf=-_BIG)

    B, _, M = cost.shape
    if _use_device_matcher():
        from myrtle_vision_tpu.ops.lsap_device import batched_target_match

        return batched_target_match(cost)

    n_valid = jnp.sum(tgt_valid.astype(jnp.int32), axis=-1)
    src_idx = jax.pure_callback(
        _match_host,
        jax.ShapeDtypeStruct((B, M), jnp.int32),
        cost,
        n_valid,
        vmap_method="sequential",
    )
    return src_idx
