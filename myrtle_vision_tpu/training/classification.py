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
    # Two-pass INT8 QAT train step: pass 1 (no gradient) runs the
    # discrete update-then-use composition and folds the batch into the
    # observers; pass 2 differentiates the SAME forward through the
    # fused Pallas block kernels with the now-frozen per-site grids
    # (models/vit.py Block int8_qat_fuse).  Because torch MinMax
    # observer updates are idempotent and each site's update-then-use
    # grid equals its post-batch grid, the two-pass step computes
    # bit-identical loss/stats to the one-pass discrete step while the
    # differentiated pass runs un-remat'd single-kernel block halves
    # (tests/test_fused_int8_qat.py).  MVT_INT8_QAT_FUSE=0 forces the
    # one-pass discrete step; unset, the fused step is used off-CPU
    # (CPU keeps one-pass — Pallas interpret mode is slower there).
    import os as _os

    _env = _os.environ.get("MVT_INT8_QAT_FUSE", "")
    two_pass = (
        qat_int8
        and _env != "0"
        and getattr(model, "dropout", 0.0) == 0.0
        and (_env == "1" or jax.default_backend() != "cpu")
    )

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
            if two_pass and quant:
                # pass 1: observers only — quant2 is stop_gradient'd,
                # so autodiff generates no backward for this apply
                _, upd1 = model.apply(
                    {
                        "params": jax.lax.stop_gradient(params),
                        "quant": quant,
                    },
                    batch["image"], calibrating=True,
                    mutable=["quant"], deterministic=False,
                    rngs={"dropout": rng},
                )
                quant2 = jax.lax.stop_gradient(upd1["quant"])
                # pass 2: the differentiated fused forward; the
                # re-updates it writes equal quant2 (idempotent)
                out, _ = model.apply(
                    {"params": params, "quant": quant2},
                    batch["image"], calibrating=True, int8_fused=True,
                    mutable=["quant"], deterministic=False,
                    rngs={"dropout": rng},
                )
                upd = {"quant": quant2}
            else:
                out, upd = apply_model(
                    variables, batch["image"], rng, True
                )
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
