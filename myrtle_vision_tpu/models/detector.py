"""Detection loss (DETR-derived SetCriterion) and COCO post-processing.

Functional, padded-target re-design of the reference's SetCriterion /
PostProcess (reference: src/myrtle_vision/models/detector.py):

- Targets are padded to a static ``max_boxes`` per image with a validity
  mask (XLA-friendly static shapes; the reference uses ragged per-image
  dicts).  Matched pairs come from the Hungarian matcher as a
  query-index-per-target-slot array (models/matcher.py).
- ``num_boxes`` normalization: the reference all-reduces the target count
  across ranks and divides by world size (detector.py:133-138); under one
  SPMD program the global sum over the sharded batch is the same
  normalization (global box-loss sum / global box count) with no explicit
  collective — XLA inserts the psum.
- Losses (detector.py:41-98): weighted CE with ``eos_coef`` down-weighting
  the no-object class, cardinality error (logging only), L1 + GIoU box
  losses normalized by num_boxes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from myrtle_vision_tpu.models.matcher import hungarian_match
from myrtle_vision_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    generalized_box_iou,
)


def criterion(
    outputs,
    targets,
    num_classes: int,
    weight_dict=None,
    eos_coef: float = 0.1,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    src_idx=None,
    axis_name=None,
):
    """Compute the DETR loss dict.

    Args:
      outputs: {"pred_logits": (B,Q,C+1), "pred_boxes": (B,Q,4) cxcywh}.
      targets: {"labels": (B,M) int32, "boxes": (B,M,4) normalized cxcywh,
                "valid": (B,M) bool}.
      num_classes: real classes (no-object = index num_classes).
      weight_dict: loss-name -> weight for the "loss" total
        (reference detection/train.py:199-215 builds it from train_config).
      axis_name: data-parallel mesh axis when running under shard_map —
        num_boxes then normalizes by the reference's cross-rank AVERAGE
        (clamp(all_reduce(count)/world_size, 1), detector.py:133-138),
        which together with the trainer's gradient pmean reproduces the
        single-process global_sum/global_boxes objective exactly.
        Without it (plain jit over one device) the local count IS the
        global count.

    Returns dict with loss_ce / class_error / cardinality_error /
    loss_bbox / loss_giou and weighted total "loss".
    """
    pred_logits = outputs["pred_logits"].astype(jnp.float32)
    pred_boxes = outputs["pred_boxes"].astype(jnp.float32)
    labels = targets["labels"].astype(jnp.int32)
    boxes = targets["boxes"].astype(jnp.float32)
    valid = targets["valid"]
    B, Q, _ = pred_logits.shape
    M = labels.shape[1]

    if src_idx is None:
        src_idx = hungarian_match(
            pred_logits, pred_boxes, labels, boxes, valid,
            cost_class=cost_class, cost_bbox=cost_bbox,
            cost_giou=cost_giou,
        )

    # cross-rank average box count, clamped to 1 (reference
    # detector.py:133-138: clamp(all_reduce(count)/world_size, 1)).
    # Under shard_map the psum must be EXPLICIT — jnp.sum alone would
    # count only the local shard and over-weight low-count shards
    num_boxes = jnp.sum(valid.astype(jnp.float32))
    if axis_name is not None:
        num_boxes = jax.lax.psum(num_boxes, axis_name) / jax.lax.axis_size(
            axis_name
        )
    num_boxes = jnp.maximum(num_boxes, 1.0)

    # ---- loss_labels (detector.py:41-60) ----
    # scatter matched target classes into a (B, Q) map initialized to
    # no-object; invalid slots scatter out of bounds and are dropped
    batch_idx = jnp.arange(B)[:, None] * jnp.ones((1, M), jnp.int32)
    scatter_q = jnp.where(valid, src_idx, Q)  # Q = out of bounds -> drop
    target_classes = jnp.full((B, Q), num_classes, jnp.int32)
    target_classes = target_classes.at[batch_idx, scatter_q].set(
        labels, mode="drop"
    )

    empty_weight = jnp.concatenate(
        [jnp.ones((num_classes,), jnp.float32),
         jnp.array([eos_coef], jnp.float32)]
    )
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[
        ..., 0
    ]
    w = empty_weight[target_classes]
    loss_ce = jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-9)

    # class_error: top-1 error over matched predictions (detector.py:57-59)
    matched_logits = jnp.take_along_axis(
        pred_logits, src_idx[..., None], axis=1
    )  # (B, M, C+1)
    matched_pred = jnp.argmax(matched_logits, axis=-1)
    correct = jnp.sum(
        ((matched_pred == labels) & valid).astype(jnp.float32)
    )
    class_error = 100.0 - 100.0 * correct / num_boxes

    # ---- cardinality (logging only, detector.py:62-74) ----
    card_pred = jnp.sum(
        (jnp.argmax(pred_logits, -1) != num_classes).astype(jnp.float32),
        axis=-1,
    )
    tgt_lengths = jnp.sum(valid.astype(jnp.float32), axis=-1)
    cardinality_error = jnp.mean(jnp.abs(card_pred - tgt_lengths))

    # ---- loss_boxes (detector.py:76-98) ----
    src_boxes = jnp.take_along_axis(
        pred_boxes, src_idx[..., None], axis=1
    )  # (B, M, 4)
    l1 = jnp.sum(jnp.abs(src_boxes - boxes), axis=-1)
    loss_bbox = jnp.sum(jnp.where(valid, l1, 0.0)) / num_boxes

    giou_pair = generalized_box_iou(
        box_cxcywh_to_xyxy(src_boxes)[..., None, :],
        box_cxcywh_to_xyxy(boxes)[..., None, :],
    )[..., 0, 0]
    loss_giou = (
        jnp.sum(jnp.where(valid, 1.0 - giou_pair, 0.0)) / num_boxes
    )

    losses = {
        "loss_ce": loss_ce,
        "class_error": jax.lax.stop_gradient(class_error),
        "cardinality_error": jax.lax.stop_gradient(cardinality_error),
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
    }
    if weight_dict is not None:
        losses["loss"] = sum(
            losses[k] * w for k, w in weight_dict.items() if w != 0
        )
    return losses


def post_process(outputs, target_sizes):
    """Model outputs -> COCO-format detections (reference detector.py:148-176).

    Args:
      outputs: {"pred_logits", "pred_boxes"}.
      target_sizes: (B, 2) [height, width] of the ORIGINAL images.

    Returns dict of (B, Q) scores / labels and (B, Q, 4) absolute-xyxy boxes.
    """
    logits = outputs["pred_logits"].astype(jnp.float32)
    out_bbox = outputs["pred_boxes"].astype(jnp.float32)
    prob = jax.nn.softmax(logits, axis=-1)
    scores = jnp.max(prob[..., :-1], axis=-1)
    labels = jnp.argmax(prob[..., :-1], axis=-1)
    boxes = box_cxcywh_to_xyxy(out_bbox)
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=1).astype(jnp.float32)
    boxes = boxes * scale[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": boxes}


def build_weight_dict(train_config):
    """Loss weights from the train_config schema
    (reference detection/train.py:199-215)."""
    return {
        "loss_ce": train_config["loss_ce"],
        "class_error": train_config.get("class_error", 0.0),
        "loss_bbox": train_config["loss_bbox"],
        "loss_giou": train_config["loss_giou"],
        "cardinality_error": train_config.get("cardinality_error", 0.0),
    }
