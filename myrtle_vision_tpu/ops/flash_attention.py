"""Pallas TPU attention kernel.

Computes softmax attention one query-block at a time so the (n, n) score
matrix never round-trips through HBM — scores live in VMEM per block and the
two matmuls hit the MXU back-to-back.  Used for long sequences (detection at
800 px: 1 cls + 2500 patches + 100 det tokens = 2601) where the XLA einsum
path would materialize ~27M floats per head.

Forward runs as a Pallas kernel; the backward pass recomputes probabilities
with plain XLA einsums (rematerialization — trades FLOPs for HBM, the right
trade on TPU).  Replaces the reference's cuDNN attention
(reference: src/myrtle_vision/models/vit.py:92-96).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_Q = 256
_LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (N, D)
    v = v_ref[0]  # (N, D)
    s = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o / denom


def _flash_forward(q, k, v, scale):
    b, h, n, d = q.shape
    n_pad = _ceil_to(n, _LANE)
    bq = min(_BLOCK_Q, n_pad)
    n_q_pad = _ceil_to(n_pad, bq)

    def prep(x):
        x = x.astype(jnp.float32).reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, n_q_pad - n), (0, 0)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    grid = (b * h, n_q_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, n_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_q_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_q_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_q_pad, d), jnp.float32),
        # CPU (tests) only supports the Pallas interpreter
        interpret=(jax.default_backend() == "cpu"),
    )(qp, kp, vp)
    return out[:, :n, :].reshape(b, h, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale):
    """Softmax attention, (b, h, n, d) -> (b, h, n, d), fp32 compute."""
    return _flash_forward(q, k, v, scale)


def _fa_fwd(q, k, v, scale):
    out = _flash_forward(q, k, v, scale)
    return out, (q, k, v)


def _fa_bwd(scale, residuals, g):
    q, k, v = (r.astype(jnp.float32) for r in residuals)
    g = g.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.float32(scale)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * jnp.float32(scale)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * jnp.float32(scale)
    return dq, dk, dv


flash_attention.defvjp(_fa_fwd, _fa_bwd)
