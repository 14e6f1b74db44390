"""Multi-head self-attention compute core.

The softmax-attention core runs with float32 softmax regardless of the
model's quantization format — mirroring the reference's quantization
boundary where a DeQuantStub follows the QKV projection and a QuantStub
precedes the output projection (reference: src/myrtle_vision/models/
vit.py:78-97).

Layout: inputs are (batch, heads, seq, head_dim).  (A bnhd einsum variant
was profiled and rejected: XLA lowers the head-major contraction to slow
convolution fusions plus the same HBM copies.)

Implementations behind one signature:
  - ``flash``: the Pallas kernel (ops/flash_attention.py), head-grouped
    batched-dot programs; measured ~25% faster than the einsum path at
    n=197 and far faster at detection lengths (scores never reach HBM).
  - ``xla``: einsum attention with fp32 scores/softmax — the quant-parity
    and probability-capture path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from myrtle_vision_tpu.ops.high_precision import (
    bdot_pv_high3,
    bdot_qk_high3,
)




def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    *,
    impl: str = "auto",
    return_probs: bool = False,
    seq_valid=None,
):
    """Softmax attention over (b, h, n, d) inputs -> (b, h, n, d).

    Args:
      q, k, v: (batch, heads, seq, head_dim), any float dtype.
      scale: score scale, typically ``head_dim ** -0.5``.
      impl: 'auto' | 'xla' | 'flash'.
      return_probs: also return (b, h, n, n) attention probabilities
        (the reference exposes them via an nn.Identity forward hook,
        vit.py:80-82,94). Forces the xla path.
    """
    if impl == "auto":
        impl = "xla" if return_probs else "flash"
    if return_probs and impl != "xla":
        raise ValueError("attention probabilities require impl='xla'")

    if impl == "flash":
        from myrtle_vision_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale, seq_valid)

    # fp32 inputs take 3-pass HIGH-grade dots (ops/high_precision.py):
    # that's the quant-parity path, where the reference computes the
    # core in true fp32 (TPU fp32 dots otherwise run ONE bf16 MXU
    # pass); the same decomposition runs inside the fused quant kernels
    # so the two paths stay bit-identical
    fp32_core = q.dtype == jnp.float32

    def _core(q, k, v):
        if fp32_core:
            # custom-VJP 3-pass dots: plain autodiff through the hi/lo
            # split would truncate the cotangent to one bf16 pass
            scores = bdot_qk_high3(q, k)
        else:
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k,
                preferred_element_type=jnp.float32,
            )
        scores = scores * jnp.float32(scale)
        if seq_valid is not None and seq_valid < q.shape[2]:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 3)
            scores = jnp.where(col < seq_valid, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        if fp32_core:
            out = bdot_pv_high3(probs, v).astype(v.dtype)
        else:
            out = jnp.einsum(
                "bhqk,bhkd->bhqd",
                probs.astype(v.dtype),
                v,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)
        return out, probs

    if fp32_core:
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    out, probs = _core(q, k, v)
    if return_probs:
        return out, probs
    return out
