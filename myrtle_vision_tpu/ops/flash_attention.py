"""Pallas TPU flash attention: forward + backward kernels.

The XLA einsum attention path materializes the (n, n) fp32 score matrix in
HBM (for ViT-S/16 at batch 256 that is ~238MB written+read 4x per layer) —
measured to cost ~13x its FLOP time on v5e.  These kernels keep scores in
VMEM: the two matmuls hit the MXU back-to-back with fp32 accumulation and
only the (n, d) output returns to HBM.

Grid design: ViT sequences are short (197..2601), so a per-(batch, head)
program would be launch-bound (1536 programs x ~100ns of MXU work each at
n=197 — measured slower than the XLA path).  Instead each program owns
``G`` (batch*head) slices and loops over them on-chip; G is sized so one
program keeps ~4k rows of q/k/v/o in VMEM.  For sequences whose score
matrix fits VMEM (n_pad <= 1536) the whole sequence is processed
unblocked; longer sequences fall back to the XLA einsum path (detection
tops out at 608px -> 1545 tokens, within budget).

Backward follows the standard flash decomposition with score
recomputation (rematerialization — FLOPs for HBM, the right trade on TPU):
  dv = p^T do ;  dp = do v^T ;  ds = p * (dp - D),  D = rowsum(do * o)
  dq = ds k * scale ;  dk = ds^T q * scale

Replaces the reference's cuDNN attention (reference:
src/myrtle_vision/models/vit.py:92-96).  Matmul inputs run bf16 on the MXU
with fp32 accumulation; softmax entirely fp32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG = -1e30  # python literal: jnp constants would be captured consts
# rows of q/k/v/o a single program keeps resident (VMEM sizing)
_ROW_BUDGET = 3072
# n_pad ceiling for the unblocked (scores fully in VMEM) kernels
_FULL_SEQ_MAX = 1536


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _dot(a, b, transpose_b=False):
    dims = (((1,), (1 if transpose_b else 0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )


def _softmax_masked3(s, n_valid):
    """Masked softmax over the last axis of (G, NQ, NK)."""
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _group_for(n_pad: int, dtype=None) -> int:
    """(b*h) slices per program so the resident q/k/v/o rows fit VMEM;
    fp32 inputs (true-fp32 parity training, JAX_DEFAULT_MATMUL_PRECISION
    =highest) halve the budget — the score/prob stack doubles."""
    budget = _ROW_BUDGET
    if dtype == jnp.float32:
        budget //= 2
    return max(1, budget // n_pad)


def _pad_group(x, dtype, n_pad, group):
    """(b, h, n, d) -> (ceil(bh/g), g, n_pad, d) padded."""
    b, h, n, d = x.shape
    bh = b * h
    x = x.astype(dtype).reshape(bh, n, d)
    x = jnp.pad(
        x, ((0, _ceil_to(bh, group) - bh), (0, n_pad - n), (0, 0))
    )
    return x.reshape(-1, group, n_pad, d)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _bdot(a, b, contract, batch=((0,), (0,))):
    """Batched dot with fp32 accumulation (Mosaic wants leading batch)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, batch),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, group):
    q = q_ref[0]  # (G, NP, D)
    k = k_ref[0]
    v = v_ref[0]
    s = _bdot(q, k, ((2,), (2,))) * scale  # (G, NP, NP)
    p = _softmax_masked3(s, n_valid)
    o = _bdot(p.astype(v.dtype), v, ((2,), (1,)))  # (G, NP, D)
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_forward(q, k, v, scale, n_valid=None):
    b, h, n, d = q.shape
    if n_valid is None:
        n_valid = n
    dtype = jnp.bfloat16 if q.dtype != jnp.float32 else q.dtype
    n_pad = _ceil_to(n, _LANE)
    if n_pad > _FULL_SEQ_MAX:
        return _xla_attention(q, k, v, scale, n_valid)
    g = _group_for(n_pad, dtype)
    qp = _pad_group(q, dtype, n_pad, g)
    kp = _pad_group(k, dtype, n_pad, g)
    vp = _pad_group(v, dtype, n_pad, g)
    n_groups = qp.shape[0]

    spec = pl.BlockSpec((1, g, n_pad, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n_valid,
                          group=g),
        grid=(n_groups,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, kp, vp)
    out = out.reshape(-1, n_pad, d)[: b * h, :n, :]
    return out.reshape(b, h, n, d)


def _xla_attention(q, k, v, scale, n_valid=None):
    s = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
    ) * jnp.float32(scale)
    if n_valid is not None and n_valid < q.shape[2]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(col < n_valid, s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
    ).astype(q.dtype)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dsum_ref,
                dq_ref, dk_ref, dv_ref, *, scale, n_valid, group):
    q = q_ref[0]   # (G, NP, D)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    dsum = dsum_ref[0]  # (G, NP, 1) fp32
    s = _bdot(q, k, ((2,), (2,))) * scale  # (G, NQ, NK)
    p = _softmax_masked3(s, n_valid)
    rowi = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    p_masked = jnp.where(rowi < n_valid, p, 0.0)
    # dv[g] = p[g]^T @ do[g] : contract the query dim
    dv = _bdot(p_masked.astype(do.dtype), do, ((1,), (1,)))
    dp = _bdot(do, v, ((2,), (2,)))  # (G, NQ, NK)
    ds = p * (dp - dsum)
    ds = jnp.where(rowi < n_valid, ds, 0.0)
    dsb = ds.astype(q.dtype)
    dq = _bdot(dsb, k, ((2,), (1,))) * scale       # (G, NQ, D)
    dk = _bdot(dsb, q, ((1,), (1,))) * scale       # (G, NK, D)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, g_out, scale, n_valid=None):
    b, h, n, d = q.shape
    if n_valid is None:
        n_valid = n
    dtype = jnp.bfloat16 if q.dtype != jnp.float32 else q.dtype
    n_pad = _ceil_to(n, _LANE)
    if n_pad > _FULL_SEQ_MAX:
        return _xla_backward(q, k, v, g_out, scale, n_valid)
    g = _group_for(n_pad, dtype)
    qp = _pad_group(q, dtype, n_pad, g)
    kp = _pad_group(k, dtype, n_pad, g)
    vp = _pad_group(v, dtype, n_pad, g)
    dop = _pad_group(g_out, dtype, n_pad, g)
    bh = b * h
    dsum = jnp.sum(
        g_out.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).reshape(bh, n)
    dsum = jnp.pad(
        dsum, ((0, _ceil_to(bh, g) - bh), (0, n_pad - n))
    ).reshape(-1, g, n_pad, 1)
    n_groups = qp.shape[0]

    spec = pl.BlockSpec((1, g, n_pad, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    dsum_spec = pl.BlockSpec((1, g, n_pad, 1), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n_valid,
                          group=g),
        grid=(n_groups,),
        in_specs=[spec, spec, spec, spec, dsum_spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct(qp.shape, k.dtype),
            jax.ShapeDtypeStruct(qp.shape, v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, kp, vp, dop, dsum)

    def unpad(x, like):
        x = x.reshape(-1, n_pad, d)[: b * h, :n, :]
        return x.reshape(b, h, n, d).astype(like.dtype)

    return unpad(dq, q), unpad(dk, k), unpad(dv, v)


def _xla_backward(q, k, v, g_out, scale, n_valid=None):
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g_out.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * jnp.float32(scale)
    if n_valid is not None and n_valid < q.shape[2]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(col < n_valid, s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * jnp.float32(scale)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * jnp.float32(scale)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale, n_valid=None):
    """Softmax attention, (b, h, n, d) -> (b, h, n, d).

    ``n_valid``: number of real tokens when the inputs are already padded
    (keys >= n_valid are masked out; padded query rows produce garbage that
    callers must ignore).  The model pads its sequence ONCE to a 128
    multiple and runs the whole transformer padded — per-layer pad/slice
    round-trips measured ~1ms/layer of HBM traffic at batch 256.
    """
    return _flash_forward(q, k, v, scale, n_valid)


def _fa_fwd(q, k, v, scale, n_valid):
    out = _flash_forward(q, k, v, scale, n_valid)
    return out, (q, k, v, out)


def _fa_bwd(scale, n_valid, residuals, g):
    q, k, v, o = residuals
    return _flash_backward(q, k, v, o, g, scale, n_valid)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
