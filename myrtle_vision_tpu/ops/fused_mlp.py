"""Fused transformer MLP block: x + fc2(gelu(fc1(layernorm(x)))).

One Pallas kernel per direction, row-blocked over the flattened
(batch * seq) dimension with both weight matrices resident in VMEM.  On
v5e the unfused XLA path pays ~0.7ms per LayerNorm and ~1.8ms per exact
GELU at ViT-S batch-256 shapes because the VPU elementwise work and the
MXU matmuls serialize through HBM; in the fused kernel the elementwise
stages live in VMEM between the two matmuls and overlap the MXU via the
grid software pipeline.

Backward recomputes the forward per row block (rematerialization) and
accumulates weight/bias/norm-parameter gradients across grid steps in
fp32 VMEM accumulator outputs (sequential TPU grid makes read-modify-write
accumulation safe); dx combines the residual, LayerNorm and matmul paths
in-kernel.

Used by the FP32 (non-quantized) fast path of FeedForward
(models/vit.py); the quant-simulation path keeps discrete fake-quant
sites and stays on the unfused implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 512       # forward
# backward holds more fp32 intermediates; 512 rows needs the raised
# per-kernel vmem ceiling and measures fastest on v5e (2890 img/s vs
# 2885 @ 256, 2801 @ 1024 at ViT-S/16 batch 256); MVT_MLP_BWD_ROWS
# overrides
_ROW_BLOCK_BWD = 512
_EPS = 1e-5
_SQRT_2 = 1.4142135623730951


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _layernorm_f32(x, scale, bias):
    """Returns (xn, mu, rstd) — all fp32; x (R, D)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jax.lax.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _erf_f32(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7) — Pallas TPU
    has no erf lowering; this is exact at bf16 activation resolution."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(h):
    hf = h.astype(jnp.float32)
    return 0.5 * hf * (1.0 + _erf_f32(hf / _SQRT_2))


def _gelu_grad_f32(h):
    hf = h.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_f32(hf / _SQRT_2))
    pdf = jnp.exp(-0.5 * jax.lax.square(hf)) * 0.3989422804014327
    return cdf + hf * pdf


def _fwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref):
    x = x_ref[...]
    xn, _, _ = _layernorm_f32(
        x, s_ref[...].astype(jnp.float32), b_ref[...].astype(jnp.float32)
    )
    xn = xn.astype(x.dtype)
    h = (
        jnp.dot(xn, w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[...].astype(jnp.float32)
    )
    g = _gelu_f32(h).astype(x.dtype)
    y = (
        jnp.dot(g, w2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[...].astype(jnp.float32)
    )
    o_ref[...] = (x.astype(jnp.float32) + y).astype(o_ref.dtype)


def _bwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                do_ref, dx_ref, ds_ref, db_ref, dw1_ref, db1_ref,
                dw2_ref, db2_ref):
    i = pl.program_id(0)
    x = x_ref[...]
    do = do_ref[...].astype(jnp.float32)
    scale = s_ref[...].astype(jnp.float32)
    bias = b_ref[...].astype(jnp.float32)

    # recompute forward intermediates for this row block
    ln_out, xhat, rstd = _layernorm_f32(x, scale, bias)
    xn = ln_out.astype(x.dtype)
    h = (
        jnp.dot(xn, w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[...].astype(jnp.float32)
    )
    g = _gelu_f32(h).astype(x.dtype)

    dob = do.astype(x.dtype)
    # fc2 backward (contractions written to avoid explicit transposes)
    dw2 = jax.lax.dot_general(
        g, dob, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg = jax.lax.dot_general(
        dob, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = dg * _gelu_grad_f32(h)
    dhb = dh.astype(x.dtype)
    # fc1 backward
    dw1 = jax.lax.dot_general(
        xn, dhb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxn = jax.lax.dot_general(
        dhb, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # LayerNorm backward (wrt pre-norm x)
    dscale = jnp.sum(dxn * xhat, axis=0)
    dbias_ln = jnp.sum(dxn, axis=0)
    dxhat = dxn * scale
    d = x.shape[-1]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)

    dx_ref[...] = (do + dx_ln).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    ds_ref[...] += dscale
    db_ref[...] += dbias_ln
    dw1_ref[...] += dw1
    db1_ref[...] += jnp.sum(dh, axis=0)
    dw2_ref[...] += dw2
    db2_ref[...] += jnp.sum(do, axis=0)


def _pad_rows(x2, rb):
    rows = x2.shape[0]
    pad = -(-rows // rb) * rb - rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    return x2, rows


def _row_specs(rb, d, hidden):
    row = pl.BlockSpec((rb, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    vec_h = pl.BlockSpec((hidden,), lambda i: (0,),
                         memory_space=pltpu.VMEM)
    w1 = pl.BlockSpec((d, hidden), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    w2 = pl.BlockSpec((hidden, d), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    return row, vec_d, vec_h, w1, w2


def _mlp_forward(x, scale, bias, w1, b1, w2, b2):
    import os

    orig_shape = x.shape
    d = orig_shape[-1]
    hidden = w1.shape[-1]
    block = int(os.environ.get("MVT_MLP_FWD_ROWS", _ROW_BLOCK))
    x2, rows = _pad_rows(x.reshape(-1, d), block)
    rb = min(block, x2.shape[0])
    row, vec_d, vec_h, w1s, w2s = _row_specs(rb, d, hidden)
    wd = x.dtype
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(x2.shape[0] // rb,),
        in_specs=[row, vec_d, vec_d, w1s, vec_h, w2s, vec_d],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x2, scale.astype(wd), bias.astype(wd), w1.astype(wd),
      b1.astype(wd), w2.astype(wd), b2.astype(wd))
    return out[:rows].reshape(orig_shape)


@jax.custom_vjp
def fused_mlp_block(x, scale, bias, w1, b1, w2, b2):
    """x + fc2(gelu(fc1(LN(x)))) over (..., D) with weights (D, H), (H, D).

    Params may be fp32; compute runs in x.dtype with fp32 accumulation,
    matching the unfused QLayerNorm/QDense/QGelu composition in FP32 mode.
    """
    return _mlp_forward(x, scale, bias, w1, b1, w2, b2)


def _fwd_rule(x, scale, bias, w1, b1, w2, b2):
    out = _mlp_forward(x, scale, bias, w1, b1, w2, b2)
    return out, (x, scale, bias, w1, b1, w2, b2)


def _bwd_rule(res, do):
    x, scale, bias, w1, b1, w2, b2 = res
    import os

    orig_shape = x.shape
    d = orig_shape[-1]
    hidden = w1.shape[-1]
    block = int(os.environ.get("MVT_MLP_BWD_ROWS", _ROW_BLOCK_BWD))
    x2, rows = _pad_rows(x.reshape(-1, d), block)
    do2, _ = _pad_rows(do.reshape(-1, d), block)
    rb = min(block, x2.shape[0])
    row, vec_d, vec_h, w1s, w2s = _row_specs(rb, d, hidden)
    wd = x.dtype

    f32 = jnp.float32
    dx, dscale, dbias, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(x2.shape[0] // rb,),
        in_specs=[row, vec_d, vec_d, w1s, vec_h, w2s, vec_d, row],
        out_specs=(
            row,
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d, hidden), f32),
            jax.ShapeDtypeStruct((hidden,), f32),
            jax.ShapeDtypeStruct((hidden, d), f32),
            jax.ShapeDtypeStruct((d,), f32),
        ),
        # larger row blocks exceed the 16MB default scoped-vmem limit;
        # v5e has 128MB VMEM, raise the per-kernel ceiling
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x2, scale.astype(wd), bias.astype(wd), w1.astype(wd),
      b1.astype(wd), w2.astype(wd), b2.astype(wd), do2)

    dx = dx[:rows].reshape(orig_shape)
    return (
        dx,
        dscale.astype(scale.dtype),
        dbias.astype(bias.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
    )


fused_mlp_block.defvjp(_fwd_rule, _bwd_rule)
