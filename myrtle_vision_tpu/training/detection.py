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

    def loss_fn(params, quant, batch, rng):
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
