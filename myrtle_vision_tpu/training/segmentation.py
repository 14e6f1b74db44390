"""Segmentation task: pixel-wise CE loss and metrics.

Reference hot loop: pixel CrossEntropyLoss on (B,C,H,W) logits vs (B,H,W)
int labels (reference: segmentation/train.py:188,260-261); our logits are
NHWC (B,H,W,C).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from myrtle_vision_tpu.quantize import QFormat


def pixel_cross_entropy(logits_nhwc, labels_hw):
    """Mean softmax CE over all pixels (torch CrossEntropyLoss equivalent)."""
    logp = jax.nn.log_softmax(logits_nhwc.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels_hw[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def make_loss_fn(model):
    qat_int8 = model.q_format == QFormat.PyTorchINT8

    def loss_fn(params, quant, batch, rng):
        variables = {"params": params}
        if quant:
            variables["quant"] = quant
        kwargs = dict(deterministic=False, rngs={"dropout": rng})
        if qat_int8:
            logits, upd = model.apply(
                variables, batch["image"], calibrating=True,
                mutable=["quant"], **kwargs,
            )
        else:
            logits = model.apply(variables, batch["image"], **kwargs)
            upd = None
        labels = batch["label"].astype(jnp.int32)
        loss = pixel_cross_entropy(logits, labels)
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        )
        aux = {"metrics": {"acc": acc}}
        if upd is not None:
            aux["quant"] = upd["quant"]
        return loss, aux

    return loss_fn
