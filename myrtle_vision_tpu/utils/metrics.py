"""Metrics: top-k accuracy and streaming mean-IoU.

TPU-native versions of the reference's metric helpers:
- ``accuracy``: precision@k (reference utils/utils.py:243-259)
- ``MIoU``: streaming per-class intersection/union histograms
  (reference utils/miou.py:5-63) — the histograms are computed on device
  with one-hot matmuls (MXU-friendly) and accumulated in float64 on host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def accuracy(output, target, topk=(1,)):
    """precision@k percentages, as in the reference (utils/utils.py:243-259)."""
    if target.size == 0:
        return [jnp.zeros(())]
    maxk = max(topk)
    batch_size = target.shape[0]
    _, pred = jax.lax.top_k(output, maxk)  # (batch, maxk)
    correct = pred == target[:, None]
    return [
        jnp.sum(correct[:, :k]).astype(jnp.float32) * (100.0 / batch_size)
        for k in topk
    ]


@functools.partial(jax.jit, static_argnums=(2,))
def _intersect_and_union_counts(pred, label, num_classes: int):
    """Per-class (intersection, pred, label) pixel counts for one image or
    batch; out-of-range labels (e.g. ignore values) fall outside all bins,
    matching torch.histc over [0, num_classes-1]."""
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    classes = jnp.arange(num_classes)

    def counts(x):
        return jnp.sum(x[:, None] == classes[None, :], axis=0)

    inter = jnp.where(pred == label, pred, -1)
    area_intersect = counts(inter)
    area_pred = counts(pred)
    area_label = counts(label)
    return area_intersect, area_pred, area_label


class MIoU:
    """Streaming mean-IoU accumulator (reference utils/miou.py:44-63)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.total_area_intersect = np.zeros(num_classes, np.float64)
        self.total_area_union = np.zeros(num_classes, np.float64)

    def add_img(self, prediction, ground_truth):
        inter, pred, label = _intersect_and_union_counts(
            jnp.asarray(prediction), jnp.asarray(ground_truth),
            self.num_classes,
        )
        inter = np.asarray(inter, np.float64)
        union = np.asarray(pred, np.float64) + np.asarray(
            label, np.float64
        ) - inter
        self.total_area_intersect += inter
        self.total_area_union += union

    # alias: batches work identically (counts are summed)
    add_batch = add_img

    def get_per_class_iou(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            return self.total_area_intersect / self.total_area_union

    def get_miou(self):
        return float(np.mean(self.get_per_class_iou()))


def dlrsd_colors():
    """17-class RGB palette for DLRSD segmentation visualization
    (reference utils/colors.py:2-22)."""
    return {
        "airplane": [166, 202, 240],
        "bare soil": [128, 128, 0],
        "buildings": [0, 0, 128],
        "cars": [255, 0, 0],
        "chaparral": [0, 128, 0],
        "court": [128, 0, 0],
        "dock": [255, 233, 233],
        "field": [160, 160, 164],
        "grass": [0, 128, 128],
        "mobile home": [90, 87, 255],
        "pavement": [255, 255, 0],
        "sand": [255, 192, 0],
        "sea": [0, 0, 255],
        "ship": [255, 0, 192],
        "tanks": [128, 0, 128],
        "trees": [0, 255, 0],
        "water": [0, 255, 255],
    }
