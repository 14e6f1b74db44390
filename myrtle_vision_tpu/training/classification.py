"""Classification task: loss/eval functions for the trainer core.

Mirrors the reference classification hot loop semantics
(reference: classification/train.py:239-285): CrossEntropy loss (or the
DeiT distillation loss when a distiller is configured), per-batch accuracy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from myrtle_vision_tpu.quantize import QFormat
from myrtle_vision_tpu.training.optim import cross_entropy_loss


def make_loss_fn(model, distiller=None, teacher_fn=None):
    """Build (params, quant, batch, rng) -> (loss, aux) for the train step.

    With a distiller, ``params`` is the DistillWrapper param tree (student
    nested under "student") and ``teacher_fn(images) -> logits`` provides the
    frozen teacher (run under stop_gradient — reference distill.py:132-133).
    """
    qat_int8 = model.q_format == QFormat.PyTorchINT8

    def apply_model(variables, images, rng, calibrating):
        kwargs = dict(deterministic=False, rngs={"dropout": rng})
        if qat_int8 and calibrating:
            return model.apply(
                variables, images, calibrating=True, mutable=["quant"],
                **kwargs,
            )
        return model.apply(variables, images, **kwargs), None

    if distiller is None:

        def loss_fn(params, quant, batch, rng):
            variables = {"params": params}
            if quant:
                variables["quant"] = quant
            out, upd = apply_model(variables, batch["image"], rng, True)
            logits = out
            loss = cross_entropy_loss(logits, batch["label"])
            acc = jnp.mean(
                (jnp.argmax(logits, axis=-1) == batch["label"]).astype(
                    jnp.float32
                )
            )
            aux = {"metrics": {"acc": acc}}
            if upd is not None:
                aux["quant"] = upd["quant"]
            return loss, aux

        return loss_fn

    def distill_loss_fn(params, quant, batch, rng):
        variables = {"params": params}
        if quant:
            variables["quant"] = quant
        teacher_logits = jax.lax.stop_gradient(teacher_fn(batch["image"]))
        kwargs = dict(deterministic=False, rngs={"dropout": rng})
        if qat_int8:
            (loss, logits), upd = distiller.apply(
                variables,
                batch["image"],
                batch["label"],
                teacher_logits,
                calibrating=True,
                mutable=["quant"],
                **kwargs,
            )
        else:
            loss, logits = distiller.apply(
                variables,
                batch["image"],
                batch["label"],
                teacher_logits,
                **kwargs,
            )
            upd = None
        acc = jnp.mean(
            (jnp.argmax(logits, axis=-1) == batch["label"]).astype(
                jnp.float32
            )
        )
        aux = {"metrics": {"acc": acc}}
        if upd is not None:
            aux["quant"] = upd["quant"]
        return loss, aux

    return distill_loss_fn


def make_predict_fn(model):
    """Jittable eval forward returning logits."""

    def predict(params, quant, images):
        variables = {"params": params}
        if quant:
            variables["quant"] = quant
        return model.apply(variables, images, deterministic=True)

    return jax.jit(predict)
