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
unblocked; longer sequences (the reference's 800px detection eval is
50x50+1+100 = 2601 tokens, data_configs/data_config.json:38) run the
BLOCKED kernels below: online-softmax over KV tiles with running
(rowmax, rowsum, accumulator) state in VMEM scratch, so the (n, n)
score matrix never exists anywhere — each program owns one (batch*head)
slice, keeps q/o resident, and streams k/v tiles through the grid
pipeline.  The backward recomputes probabilities per KV tile from the
forward's saved log-sum-exp rows and accumulates dq in scratch while
emitting dk/dv per tile.  Measured (v5e, b=8 h=6 n=2601 d=64 bf16):
forward 4.15ms (20.0 TFLOP/s) vs 7.01ms (11.9) for the XLA einsum it
replaces; fwd maxdiff vs XLA one bf16 ULP.

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


def _kernel_precision(a):
    """Contract precision for dots INSIDE the Pallas kernels.

    ``JAX_DEFAULT_MATMUL_PRECISION=highest`` (the true-fp32 training
    recipe, README "Matmul precision") applies to every dot whose
    precision is None — including these.  Mosaic rejects fp32 contract
    precision on bf16 operands ("Bad lhs type"), and it would be a
    no-op anyway: bf16 products are exact in the fp32 accumulator.  So
    pin DEFAULT for low-precision operands and inherit the env only
    for fp32 operands, where multi-pass precision is real.
    """
    return None if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _dot(a, b, transpose_b=False):
    dims = (((1,), (1 if transpose_b else 0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=_kernel_precision(a),
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
        precision=_kernel_precision(a),
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
        return _blocked_forward(q, k, v, scale, n_valid)
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
    """Reference oracle for the kernel parity tests
    (tests/test_flash_attention.py) — not a production path."""
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
# blocked forward (online softmax over KV tiles, n_pad > _FULL_SEQ_MAX)
# ---------------------------------------------------------------------------

def _pick_kv_blk(n_pad: int) -> int:
    """KV tile width: the largest 128-multiple divisor of n_pad <= 512.
    The scores block is (n_pad, kv_blk) fp32 — 2688x384x4 = 4MB, ~3 live
    copies through the softmax update stay well inside the 64MB
    scoped-VMEM ceiling at detection-eval scale (2601 -> n_pad 2688)."""
    for blk in range(512, 0, -128):
        if n_pad % blk == 0:
            return blk
    return 128


def _blk_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                    m_scr, l_scr, acc_scr, *, scale, n_valid, n_kv,
                    kv_blk):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (NQ, D)
    k = k_ref[0]  # (KV_BLK, D)
    v = v_ref[0]
    s = _dot(q, k, transpose_b=True) * scale  # (NQ, KV_BLK) fp32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * kv_blk
    s = jnp.where(col < n_valid, s, _NEG)

    m_prev = m_scr[...]          # (NQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    e = jnp.exp(s - m_new)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(e, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + _dot(e.astype(v.dtype), v)
    m_scr[...] = m_new

    @pl.when(j == n_kv - 1)
    def _finalize():
        l = l_scr[...]
        # NOTE padded query rows do NOT have l == 0: every masked score
        # is _NEG, so e = exp(_NEG - _NEG) = 1 and l accumulates to
        # n_pad; their lse comes out ~_NEG + log(n_pad), which keeps the
        # backward's p = exp(s - lse) FINITE (= 1/n_pad) — those rows
        # are then discarded by the row < n_valid masks and the caller's
        # slice.  The guard below only defends a hypothetical l == 0.
        o = acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = o.astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(jnp.where(l > 0.0, l, 1.0))


def _blocked_forward(q, k, v, scale, n_valid, *, save_lse=False):
    b, h, n, d = q.shape
    dtype = jnp.bfloat16 if q.dtype != jnp.float32 else q.dtype
    n_pad = _ceil_to(n, _LANE)
    kv_blk = _pick_kv_blk(n_pad)
    bh = b * h

    def flat(x):
        x = x.astype(dtype).reshape(bh, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qp, kp, vp = flat(q), flat(k), flat(v)
    n_kv = n_pad // kv_blk

    q_spec = pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, kv_blk, d), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    # lse lives as (bh, n_pad, 1): the trailing singleton keeps the block's
    # last two dims (n_pad, 1) legal for Mosaic (last dim equals the array
    # dim; n_pad is a multiple of 8) and matches the kernel's (rows, 1)
    # scratch layout with no transposes
    lse_spec = pl.BlockSpec((1, n_pad, 1), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out, lse = pl.pallas_call(
        functools.partial(_blk_fwd_kernel, scale=scale, n_valid=n_valid,
                          n_kv=n_kv, kv_blk=kv_blk),
        grid=(bh, n_kv),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(q_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, 1), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad, 1), f32),   # running rowmax
            pltpu.VMEM((n_pad, 1), f32),   # running rowsum
            pltpu.VMEM((n_pad, d), f32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, kp, vp)
    out = out[:, :n, :].reshape(b, h, n, d)
    if save_lse:
        return out, lse  # lse stays (bh, n_pad, 1) for the backward
    return out


def _blk_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                    dq_ref, dk_ref, dv_ref, dsum_scr, dq_scr,
                    *, scale, n_valid, n_kv, kv_blk):
    j = pl.program_id(1)
    q = q_ref[0]    # (NQ, D)
    do = do_ref[0]  # (NQ, D)

    @pl.when(j == 0)
    def _init():
        dsum_scr[...] = jnp.sum(
            do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        dq_scr[...] = jnp.zeros_like(dq_scr)

    k = k_ref[0]    # (KV_BLK, D)
    v = v_ref[0]
    lse = lse_ref[0]  # (NQ, 1)
    s = _dot(q, k, transpose_b=True) * scale  # (NQ, KV_BLK)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * kv_blk
    s = jnp.where(col < n_valid, s, _NEG)
    p = jnp.exp(s - lse)
    # mask padded/invalid QUERY rows out of the dk/dv contractions
    row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    p_masked = jnp.where(row < n_valid, p, 0.0)
    pb = p_masked.astype(do.dtype)

    def dot_t(a, b):  # a^T @ b: contract the query dim
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_kernel_precision(a),
        )

    dv_ref[0] = dot_t(pb, do).astype(dv_ref.dtype)  # (KV_BLK, D)
    dp = _dot(do, v, transpose_b=True)  # (NQ, KV_BLK)
    ds = p * (dp - dsum_scr[...])
    ds = jnp.where(row < n_valid, ds, 0.0)
    dsb = ds.astype(q.dtype)
    dk_ref[0] = (dot_t(dsb, q) * scale).astype(dk_ref.dtype)
    dq_scr[...] += _dot(dsb, k) * scale

    @pl.when(j == n_kv - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _blocked_backward(q, k, v, o, g_out, lse, scale, n_valid):
    b, h, n, d = q.shape
    dtype = jnp.bfloat16 if q.dtype != jnp.float32 else q.dtype
    n_pad = _ceil_to(n, _LANE)
    kv_blk = _pick_kv_blk(n_pad)
    bh = b * h

    def flat(x):
        x = x.astype(dtype).reshape(bh, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qp, kp, vp, dop, op = flat(q), flat(k), flat(v), flat(g_out), flat(o)
    n_kv = n_pad // kv_blk

    q_spec = pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, kv_blk, d), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, n_pad, 1), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dq, dk, dv = pl.pallas_call(
        functools.partial(_blk_bwd_kernel, scale=scale, n_valid=n_valid,
                          n_kv=n_kv, kv_blk=kv_blk),
        grid=(bh, n_kv),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec, lse_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad, 1), f32),  # dsum = rowsum(do * o)
            pltpu.VMEM((n_pad, d), f32),  # dq accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, kp, vp, dop, op, lse)

    def unpad(x, like):
        return x[:, :n, :].reshape(b, h, n, d).astype(like.dtype)

    return unpad(dq, q), unpad(dk, k), unpad(dv, v)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref,
                dq_ref, dk_ref, dv_ref, *, scale, n_valid, group):
    q = q_ref[0]   # (G, NP, D)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # dsum = rowsum(do * o) computed IN-KERNEL from blocks already
    # resident in VMEM — the former standalone XLA reduction re-read
    # do and o from HBM (~155MB/layer at ViT-S/16 batch 512)
    dsum = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # (G, NP, 1) fp32
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
    op = _pad_group(o, dtype, n_pad, g)
    n_groups = qp.shape[0]

    spec = pl.BlockSpec((1, g, n_pad, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n_valid,
                          group=g),
        grid=(n_groups,),
        in_specs=[spec, spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct(qp.shape, k.dtype),
            jax.ShapeDtypeStruct(qp.shape, v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, kp, vp, dop, op)

    def unpad(x, like):
        x = x.reshape(-1, n_pad, d)[: b * h, :n, :]
        return x.reshape(b, h, n, d).astype(like.dtype)

    return unpad(dq, q), unpad(dk, k), unpad(dv, v)


def _xla_backward(q, k, v, g_out, scale, n_valid=None):
    """Reference oracle for the kernel parity tests — the custom
    VJP routes long sequences to _blocked_backward, so this is not
    reached in production."""
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
    n = q.shape[2]
    if _ceil_to(n, _LANE) > _FULL_SEQ_MAX:
        out, lse = _blocked_forward(
            q, k, v, scale, n if n_valid is None else n_valid,
            save_lse=True,
        )
        return out, (q, k, v, out, lse)
    out = _flash_forward(q, k, v, scale, n_valid)
    return out, (q, k, v, out, None)


def _fa_bwd(scale, n_valid, residuals, g):
    q, k, v, o, lse = residuals
    if lse is not None:
        n = q.shape[2]
        return _blocked_backward(
            q, k, v, o, g, lse, scale,
            n if n_valid is None else n_valid,
        )
    return _flash_backward(q, k, v, o, g, scale, n_valid)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
