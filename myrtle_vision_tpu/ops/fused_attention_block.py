"""Fused transformer attention block:
x + proj(attention(qkv(layernorm(x)))).

One Pallas program per (group of) batch image(s); everything between the
HBM read of x and the HBM write of the residual output stays in VMEM.
This removes the (3,b,h,n,d) permute (~1ms/layer of HBM copies at batch
256) and the per-layer pad/slice of the standalone flash kernel.

Transpose-free head handling: Mosaic requires leading batch dims for
batched dots and in-kernel transposes lower poorly, so every contraction
is arranged to produce the next operand in the layout it is consumed in:

  xn   = LN(x)                                    (N, C)
  q/k/v = dot(W3[h] (C,D), xn (N,C))   -> per head (H, D, N)
  s    = dot_b(q, k | contract D, batch H)        (H, N, N)
  p    = softmax_f32(s)
  o    = dot_b(p, v | contract Nk, batch H)       (H, N, D)
  y    = dot_b(o, Wp3[h] (D, C), batch H) summed over H  (N, C)
  out  = x + y + bias

The fused QKV weight (C, 3C) is reshaped once outside the kernel into
(3, H, C, D) and the projection into (H, D, C) — pure jnp reshapes of
~1.7MB, hoisted by XLA.

Backward recomputes the forward per program (rematerialization) and
accumulates weight/bias/norm grads in fp32 VMEM outputs across the
sequential grid.  Used by the FP32 fast path of the transformer Block
(models/vit.py); quant formats keep the discrete-site implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _ln_f32(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jax.lax.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _qkv_heads(xn, w3):
    """xn (N, C) x w3 (3, H, C, D) -> (3, H, D, N) (contraction over C;
    output = lhs free dims then rhs free dims)."""
    return jax.lax.dot_general(
        w3, xn, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _attention_core(q, k, v, scale):
    """q/k/v (H, D, N) fp32-accumulated bf16 -> o (H, N, D)."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (H, Nq, Nk)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, Nq, D)
    return o, p


def _fwd_kernel(x_ref, s_ref, b_ref, w3_ref, bq_ref, wp_ref, bp_ref,
                o_ref, *, scale, heads, group):
    scale_ln = s_ref[...].astype(jnp.float32)
    bias_ln = b_ref[...].astype(jnp.float32)
    for j in range(group):
        x = x_ref[j]  # (N, C)
        ln_out, _, _ = _ln_f32(x, scale_ln, bias_ln)
        xn = ln_out.astype(x.dtype)
        qkv = _qkv_heads(xn, w3_ref[...])  # (3, H, D, N) fp32
        # qkv bias: bq (3, H, D) broadcast over N
        qkv = qkv + bq_ref[...][..., None].astype(jnp.float32)
        qkv = qkv.astype(x.dtype)
        q, k, v = qkv[0], qkv[1], qkv[2]
        o, _ = _attention_core(q, k, v, scale)
        # projection: per-head partial products summed over heads
        y = jax.lax.dot_general(
            o.astype(x.dtype), wp_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (H, N, C)
        y = jnp.sum(y, axis=0) + bp_ref[...].astype(jnp.float32)
        o_ref[j] = (x.astype(jnp.float32) + y).astype(o_ref.dtype)


def _prep_weights(wqkv, bqkv, wp, heads, dtype):
    c = wp.shape[-1]
    d = c // heads
    w3 = wqkv.reshape(c, 3, heads, d).transpose(1, 2, 0, 3).astype(dtype)
    bq3 = bqkv.reshape(3, heads, d)
    wp3 = wp.reshape(heads, d, c).astype(dtype)
    return w3, bq3, wp3


def _fwd_group(b: int) -> int:
    """Images per forward grid step (MVT_ATTN_FWD_GROUP overrides).

    Default 8: measured on v5e at ViT-S/16 batch 512 — infer img/s
    9439 (g=1) / 9583 (g=4) / 9808 (g=8) / 9317 (g=16); train follows
    the same shape.  The forward holds no accumulators so larger groups
    are cheap until block size crowds the pipeline (g=16)."""
    import os

    env = os.environ.get("MVT_ATTN_FWD_GROUP")
    if env:
        g = int(env)
        return g if b % g == 0 else 1
    for g in (8, 4, 2):
        if b % g == 0:
            return g
    return 1


def _per_image_stack_bytes(n: int, heads: int, d: int) -> int:
    """Rough per-image VMEM stack estimate for one unrolled kernel
    iteration: ~3 fp32 copies of the (H, N, N) score/prob tensors plus
    the fp32 qkv intermediates (Mosaic does not reuse stack across
    unrolled iterations)."""
    return 3 * heads * n * n * 4 + 2 * 3 * heads * d * n * 4


def fuses_at(n: int, heads: int, d: int) -> bool:
    """Whether the fused block kernels can hold one image's attention
    working set under the per-kernel VMEM ceiling; longer sequences
    (e.g. detection eval at 800px -> ~2600 tokens) take the unfused
    path, which routes to the flash-attention kernels."""
    return _per_image_stack_bytes(n, heads, d) <= 40 * 1024 * 1024


def _cap_group(g: int, b: int, n: int, heads: int, d: int) -> int:
    """Shrink the image group so the unrolled loop's total live stack
    stays under the VMEM ceiling (long sequences force smaller groups)."""
    per_image = _per_image_stack_bytes(n, heads, d)
    while g > 1 and (g * per_image > 40 * 1024 * 1024 or b % g):
        g //= 2
    return max(g, 1)


def _attn_forward(x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale):
    b, n, c = x.shape
    d = c // heads
    g = _cap_group(_fwd_group(b), b, n, heads, d)
    w3, bq3, wp3 = _prep_weights(wqkv, bqkv, wp, heads, x.dtype)

    row = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, heads=heads, group=g
        ),
        grid=(b // g,),
        in_specs=[
            row,
            vec_c,
            vec_c,
            pl.BlockSpec((3, heads, c, d), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, heads, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, d, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_c,
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x, scale_ln.astype(x.dtype), bias_ln.astype(x.dtype), w3,
      bq3.astype(jnp.float32), wp3, bp.astype(x.dtype))
    return out


def _bwd_kernel(x_ref, s_ref, b_ref, w3_ref, bq_ref, wp_ref,
                do_ref, dx_ref, ds_ref, db_ref, dw3_ref, dbq_ref,
                dwp_ref, dbp_ref, *, scale, heads, group):
    """Backward for a GROUP of images per grid step.

    Weight/bias/norm grads for the whole group are summed into local
    values first and hit the fp32 VMEM accumulator outputs ONCE per grid
    step — grouping divides the ~2.4MB accumulator read-modify-write
    traffic (and the grid/pipeline overhead) by ``group``."""
    i = pl.program_id(0)
    scale_ln = s_ref[...].astype(jnp.float32)
    bias_ln = b_ref[...].astype(jnp.float32)

    acc = None
    for j in range(group):
        grads = _bwd_one_image(
            x_ref[j], do_ref[j].astype(jnp.float32), scale_ln, bias_ln,
            w3_ref, bq_ref, wp_ref, dx_ref, j, scale=scale,
        )
        acc = grads if acc is None else tuple(
            a + g for a, g in zip(acc, grads)
        )
    dscale, dbias, dw3, dbq, dwp, dbp = acc

    @pl.when(i == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    ds_ref[...] += dscale
    db_ref[...] += dbias
    dw3_ref[...] += dw3
    dbq_ref[...] += dbq
    dwp_ref[...] += dwp
    dbp_ref[...] += dbp


def _bwd_one_image(x, do, scale_ln, bias_ln, w3_ref, bq_ref, wp_ref,
                   dx_ref, j, *, scale):
    # ---- recompute forward ----
    ln_out, xhat, rstd = _ln_f32(x, scale_ln, bias_ln)
    xn = ln_out.astype(x.dtype)
    qkv = _qkv_heads(xn, w3_ref[...])
    qkv = qkv + bq_ref[...][..., None].astype(jnp.float32)
    qkv = qkv.astype(x.dtype)
    q, k, v = qkv[0], qkv[1], qkv[2]
    o, p = _attention_core(q, k, v, scale)
    ob = o.astype(x.dtype)

    dob = do.astype(x.dtype)
    # ---- proj backward ----
    # y_h = o_h @ wp_h ; dwp_h = o_h^T do ; do_h = do @ wp_h^T
    dwp = jax.lax.dot_general(
        ob, dob, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, D, C)
    d_o = jax.lax.dot_general(
        wp_ref[...], dob, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, D, N) : contraction over C of wp (H,D,C) x do (N,C)

    # ---- attention backward ----
    # o = p @ v  (per head): dv (H, D, N) layout to match forward use
    # dv[h] = o-grad^T p : dv (H, Nk, D)? we need dv in (H, D, Nk).
    # d_o is (H, D, Nq); p (H, Nq, Nk)
    dv = jax.lax.dot_general(
        d_o, p.astype(x.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, D, Nk)
    dp = jax.lax.dot_general(
        d_o.astype(x.dtype), v,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # d_o (H,D,Nq) x v (H,D,Nk) contract D -> (H, Nq, Nk) directly
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (H,Nq,Nk)
    dsb = ds.astype(x.dtype)
    # s = q^T k scaled (q (H,D,Nq)): dq (H, D, Nq) = k @ ds^T * scale
    dq = jax.lax.dot_general(
        k, dsb, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (H, D, Nq)
    dk = jax.lax.dot_general(
        q, dsb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (H, D, Nk)

    dqkv = jnp.stack([dq, dk, dv])  # (3, H, D, N) fp32
    # qkv = w3 (3,H,C,D) contract C with xn (N,C) -> (3,H,D,N)
    dqkvb = dqkv.astype(x.dtype)
    # dw3 accumulated in (3,H,D,C) — the natural output of this dot;
    # the (C, 3C) un-reshape outside the kernel handles the layout
    dw3 = jax.lax.dot_general(
        dqkvb, xn, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3, H, D, C)
    # dxn (N, C) = sum over 3,H of w3 (3,H,C,D) x dqkv (3,H,D,N)
    # (Mosaic supports at most ONE batch dim: fold (3,H) into one)
    gh = dqkvb.shape[0] * dqkvb.shape[1]
    w3_flat = w3_ref[...].reshape(gh, *w3_ref.shape[2:])
    dqkv_flat = dqkvb.reshape(gh, *dqkvb.shape[2:])
    dxn = jax.lax.dot_general(
        dqkv_flat, w3_flat,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # dqkv (3H,D,N) x w3 (3H,C,D) contract D -> (3H, N, C) directly
    dxn = jnp.sum(dxn, axis=0)  # (N, C)

    # ---- LayerNorm backward ----
    dscale = jnp.sum(dxn * xhat, axis=0)
    dbias = jnp.sum(dxn, axis=0)
    dxhat = dxn * scale_ln
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)

    dx_ref[j] = (do + dx_ln).astype(dx_ref.dtype)
    return (
        dscale, dbias, dw3, jnp.sum(dqkv, axis=-1), dwp,
        jnp.sum(do, axis=0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_attention_block(x, scale_ln, bias_ln, wqkv, bqkv, wp, bp,
                          heads, scale):
    """x + proj(MHA(qkv(LN(x)))) over (B, N, C).

    wqkv: (C, 3C) fused projection (feature order [3][h][d], the timm/
    reference layout); wp: (C, C); heads/scale static.
    """
    return _attn_forward(
        x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale
    )


def _fwd_rule(x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale):
    out = _attn_forward(
        x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale
    )
    return out, (x, scale_ln, bias_ln, wqkv, bqkv, wp)


def _bwd_group(b: int) -> int:
    """Images per backward grid step (MVT_ATTN_BWD_GROUP overrides).

    Default 4: measured on v5e at ViT-S/16 batch 512 after the
    transpose-free contraction rework — train img/s 3081 (g=2) /
    3143 (g=4) / 2972 (g=8); the accumulator RMW amortization wins
    until the unrolled loop's ~2MB/image stack crowds out block
    double-buffering."""
    import os

    env = os.environ.get("MVT_ATTN_BWD_GROUP")
    if env:
        g = int(env)
        return g if b % g == 0 else 1
    for g in (4, 2):
        if b % g == 0:
            return g
    return 1


def _bwd_rule(heads, scale, res, do):
    x, scale_ln, bias_ln, wqkv, bqkv, wp = res
    b, n, c = x.shape
    d = c // heads
    g = _cap_group(_bwd_group(b), b, n, heads, d)
    w3, bq3, wp3 = _prep_weights(wqkv, bqkv, wp, heads, x.dtype)

    row = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    f32 = jnp.float32
    dx, dscale, dbias, dw3, dbq3, dwp3, dbp = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, heads=heads, group=g
        ),
        grid=(b // g,),
        in_specs=[
            row, vec_c, vec_c,
            rep((3, heads, c, d)), rep((3, heads, d)), rep((heads, d, c)),
            row,
        ],
        out_specs=(
            row, vec_c, vec_c,
            rep((3, heads, d, c)), rep((3, heads, d)), rep((heads, d, c)),
            vec_c,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((3, heads, d, c), f32),
            jax.ShapeDtypeStruct((3, heads, d), f32),
            jax.ShapeDtypeStruct((heads, d, c), f32),
            jax.ShapeDtypeStruct((c,), f32),
        ),
        # the grouped kernel's unrolled loop keeps ~2MB/image of stack
        # live past the 16MB default scoped-vmem limit; v5e has 128MB
        # VMEM so raise the per-kernel ceiling instead of shrinking g
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x, scale_ln.astype(x.dtype), bias_ln.astype(x.dtype), w3,
      bq3.astype(f32), wp3, do.astype(x.dtype))

    # un-reshape weight grads back to the (C, 3C) / (3C,) / (C, C) layouts
    # (dw3 arrives as (3, H, D, C) — the kernel's transpose-free layout)
    dwqkv = dw3.transpose(3, 0, 1, 2).reshape(c, 3 * c)
    dbqkv = dbq3.reshape(3 * c)
    dwp = dwp3.reshape(c, c)
    return (
        dx,
        dscale.astype(scale_ln.dtype),
        dbias.astype(bias_ln.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwp.astype(wp.dtype),
        dbp.astype(jnp.float32),
    )


fused_attention_block.defvjp(_fwd_rule, _bwd_rule)
