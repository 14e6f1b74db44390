"""Multi-head self-attention compute core.

The softmax-attention core always runs in float32 regardless of the model's
quantization format — mirroring the reference's quantization boundary where a
DeQuantStub follows the QKV projection and a QuantStub precedes the output
projection (reference: src/myrtle_vision/models/vit.py:78-97).

Two interchangeable implementations behind one signature:
  - ``xla``: jnp.einsum softmax attention (XLA fuses this well at ViT sizes)
  - ``flash``: a Pallas TPU flash-attention kernel (ops/flash_attention.py)
    used automatically for long sequences (detection at 800px -> 2601 tokens)
    where materializing the (n, n) attention matrix wastes HBM bandwidth.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Sequence length above which the Pallas flash kernel wins over the XLA
# einsum path (the einsum path is faster at classification's 197 tokens
# because the whole score matrix fits comfortably in VMEM/caches).
_FLASH_MIN_SEQ = 512


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    *,
    impl: str = "auto",
    return_probs: bool = False,
):
    """Softmax attention over (batch, heads, seq, head_dim) inputs.

    Args:
      q, k, v: (b, h, n, d) arrays (any float dtype; compute is fp32).
      scale: score scale, typically ``head_dim ** -0.5``.
      impl: 'auto' | 'xla' | 'flash'.
      return_probs: also return the (b, h, n, n) attention probabilities
        (the reference exposes them via an nn.Identity forward hook,
        vit.py:80-82,94). Forces the xla path.

    Returns:
      out: (b, h, n, d) float32, and optionally the attention probs.
    """
    n = q.shape[-2]
    if impl == "auto":
        impl = "flash" if (n >= _FLASH_MIN_SEQ and not return_probs) else "xla"
    if return_probs and impl != "xla":
        raise ValueError("attention probabilities require impl='xla'")

    if impl == "flash":
        from myrtle_vision_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * jnp.float32(scale)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vf)
    if return_probs:
        return out, probs
    return out
