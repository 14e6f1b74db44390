"""Detection task: DETR loss for the trainer core + COCO validation.

Mirrors the reference detection hot loop (reference: detection/train.py:
239-287): model forward -> SetCriterion -> weighted loss; per-epoch COCO
validation through PostProcess + the evaluator, with best-AP checkpointing
handled by the entry script (train.py:304-319).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.models.detector import criterion, post_process
from myrtle_vision_tpu.quantize import QFormat


def make_loss_fn(model, num_classes, weight_dict, eos_coef):
    qat_int8 = model.q_format == QFormat.PyTorchINT8

    def loss_fn(params, quant, batch, rng, axis_name=None):
        variables = {"params": params}
        if quant:
            variables["quant"] = quant
        kwargs = dict(deterministic=False, rngs={"dropout": rng})
        if qat_int8:
            outputs, upd = model.apply(
                variables, batch["image"], calibrating=True,
                mutable=["quant"], **kwargs,
            )
        else:
            outputs = model.apply(variables, batch["image"], **kwargs)
            upd = None
        targets = {
            "labels": batch["labels"],
            "boxes": batch["boxes"],
            "valid": batch["valid"],
        }
        losses = criterion(
            outputs,
            targets,
            num_classes=num_classes,
            weight_dict=weight_dict,
            eos_coef=eos_coef,
            src_idx=batch.get("src_idx"),
            axis_name=axis_name,
        )
        loss = losses.pop("loss")
        aux = {"metrics": losses}
        if upd is not None:
            aux["quant"] = upd["quant"]
        return loss, aux

    return loss_fn


def make_detect_fn(model):
    """Jitted eval forward -> {"pred_logits", "pred_boxes"}."""

    def detect(params, quant, images):
        variables = {"params": params}
        if quant:
            variables["quant"] = quant
        return model.apply(variables, images, deterministic=True)

    return jax.jit(detect)


def evaluate_coco(detect_fn, state, loader, coco_index, epoch=0):
    """COCO mAP over a loader of collated detection batches
    (reference detection/train.py:40-71).  Returns the evaluator (stats[0]
    = AP@[.5:.95])."""
    from myrtle_vision_tpu.eval.coco_eval import CocoEvaluator

    evaluator = CocoEvaluator(coco_index)
    for batch in loader.epoch(epoch):
        outputs = detect_fn(
            state.params, state.quant, jnp.asarray(batch["image"])
        )
        results = post_process(outputs, jnp.asarray(batch["orig_size"]))
        scores = np.asarray(results["scores"])
        labels = np.asarray(results["labels"])
        boxes = np.asarray(results["boxes"])
        predictions = {
            int(img_id): {
                "scores": scores[i],
                "labels": labels[i],
                "boxes": boxes[i],
            }
            for i, img_id in enumerate(batch["image_id"])
        }
        evaluator.update(predictions)
    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    evaluator.summarize()
    return evaluator


def make_match_fn(model):
    """Split-step matching: a standalone jitted program that runs the
    forward (no grad) AND the Hungarian assignment for every micro-batch
    in ONE program, returning src_idx [n_accum, B, M].

    Why split from the grad step: this container's TPU runtime faults
    when re-executing a single program that combines the transformer,
    the loop-based matcher and the gradient computation; split as
    (forward+matcher) / (grad-with-indices) the two programs re-execute
    fine.  At ~100ms tunnel-dispatch RTT each saved program is ~100ms of
    wall time per step, and the merged form also keeps the micro-batch
    logits/boxes in VMEM/HBM-local form instead of round-tripping them
    between two programs (the round-3 epoch profile was dispatch-bound:
    139s/epoch with ~10ms/step of chip compute).
    MVT_DETECTION_MATCH_PROGRAMS=3 restores the fully-split
    forward-only / matcher-only pair (diagnostic fallback for runtimes
    where even forward+matcher faults on re-execution).
    Costs one extra forward — only used when MVT_DETECTION_MATCH=split
    or on the affected backend (detection/train.py decides).

    Semantics note: the matching forward runs DETERMINISTIC (no
    dropout), while the fused path matches on the training forward.
    Identical for every reference detection config (all ship
    dropout=0.0); with dropout>0 the split matcher would see slightly
    different logits than the loss — prefer fused matching there.
    """
    import os

    from myrtle_vision_tpu.models.matcher import hungarian_match

    if os.environ.get("MVT_DETECTION_MATCH_PROGRAMS") == "3":
        @jax.jit
        def forward(params, quant, images_acc):
            variables = {"params": params}
            if quant:
                variables["quant"] = quant

            def micro(_, images):
                out = model.apply(variables, images, deterministic=True)
                return 0, (out["pred_logits"], out["pred_boxes"])

            _, (logits, boxes) = jax.lax.scan(micro, 0, images_acc)
            return logits, boxes

        @jax.jit
        def match(logits_acc, boxes_acc, labels_acc, tboxes_acc,
                  valid_acc):
            def micro(_, args):
                logits, boxes, labels, tboxes, valid = args
                src = hungarian_match(logits, boxes, labels, tboxes,
                                      valid)
                return 0, src

            _, src = jax.lax.scan(
                micro, 0,
                (logits_acc, boxes_acc, labels_acc, tboxes_acc,
                 valid_acc),
            )
            return src

        def compute_src_idx(state, batch):
            logits, boxes = forward(
                state.params, state.quant, batch["image"]
            )
            return match(
                logits, boxes, batch["labels"], batch["boxes"],
                batch["valid"],
            )

        return compute_src_idx

    @jax.jit
    def fwd_match(params, quant, images_acc, labels_acc, tboxes_acc,
                  valid_acc):
        variables = {"params": params}
        if quant:
            variables["quant"] = quant

        def micro(_, args):
            images, labels, tboxes, valid = args
            out = model.apply(variables, images, deterministic=True)
            src = hungarian_match(
                out["pred_logits"], out["pred_boxes"], labels, tboxes,
                valid,
            )
            return 0, src

        _, src = jax.lax.scan(
            micro, 0, (images_acc, labels_acc, tboxes_acc, valid_acc)
        )
        return src

    def compute_src_idx(state, batch):
        return fwd_match(
            state.params, state.quant, batch["image"], batch["labels"],
            batch["boxes"], batch["valid"],
        )

    return compute_src_idx


def use_split_matching() -> bool:
    """MVT_DETECTION_MATCH=fused|split overrides; default: split on the
    affected (axon) backend, fused single-program elsewhere."""
    import os

    choice = os.environ.get("MVT_DETECTION_MATCH", "auto")
    if choice == "fused":
        return False
    if choice == "split":
        return True
    if jax.default_backend() == "axon":
        return True
    # newer axon plugin builds register as plain "tpu"; identify via the
    # PJRT platform_version string
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        version = ""
    return "axon" in version
