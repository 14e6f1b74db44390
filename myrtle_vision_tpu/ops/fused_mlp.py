"""Fused transformer MLP block: x + fc2(gelu(fc1(layernorm(x)))).

One Pallas kernel per direction over (B, N, C) with a GROUP of images per
grid step and both weight matrices resident in VMEM.  On v5e the unfused
XLA path pays ~0.7ms per LayerNorm and ~1.8ms per exact GELU at ViT-S
batch-256 shapes because the VPU elementwise work and the MXU matmuls
serialize through HBM; in the fused kernel the elementwise stages live in
VMEM between the two matmuls and overlap the MXU via the grid software
pipeline.

The kernels consume the (B, N, C) activation directly: an earlier
row-blocked variant flattened to (B*N, C) first, and because B*N
reshapes cross the (8, 128) tile boundaries XLA materialized a real
layout copy on BOTH sides of every kernel — ~0.24ms x ~40 instances
~= 10ms/step at ViT-S batch 512 (measured; see git history).

Backward recomputes the forward per image (rematerialization), sums the
whole group's weight/bias/norm grads locally, and hits the fp32 VMEM
accumulator outputs once per grid step (sequential TPU grid makes
read-modify-write accumulation safe); dx combines the residual, LayerNorm
and matmul paths in-kernel.

Remat is a MEASURED choice here, unlike the attention block (which saves
its qkv rows — ops/acts_policy.py): saving the (N, hidden) pre-GELU rows
and skipping the fc1 recompute was tried on v5e at ViT-S/16 b512 and
LOST — 4.74 -> 6.14 ms per block fwd+bwd at g=4 (6.66 at g=8).  A probe
that streamed the saved block into the kernel WITHOUT using it measured
6.67 ms, i.e. the entire regression is the HBM->VMEM streaming of the
4x-wider residual (~160 GB/s effective on this part, far below the fc1
recompute's effective compute rate), not lost MXU/VPU overlap (moving
the GELU into the pipelined stage A changed nothing).  At hidden=4C the
recompute wins; revisit only if the per-block stream rate improves.

Used by the FP32 (non-quantized) fast path of FeedForward
(models/vit.py).  Stateless quantization formats (FP16_16 / FP16_32 /
TF32) run the same kernels with ``qspec=(exp_bits, man_bits,
all_sites)``: float-format snaps applied in-kernel at the discrete-site
positions (QLayerNorm/QDense/QGelu ActQuant sites), fp32 activations,
3-pass HIGH-grade dots (ops/high_precision.py), and the exact-divide
polynomial GELU shared with
the unfused QGelu — see ops/fused_attention_block.py for the design
note.  PyTorchINT8 (stateful observers) keeps the unfused path.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myrtle_vision_tpu.ops.fake_quant import (
    float_quantize,
    snap as _snap,
    snap_all as _snap_all,
    snap_int8 as _snap_int8,
)
from myrtle_vision_tpu.ops.high_precision import dot_high3

_EPS = 1e-5
_SQRT_2 = 1.4142135623730951


def _mm(a, b, qspec, dims=None):
    """fp32-accumulating matmul: DEFAULT precision for the bf16 path,
    3-pass bf16 decomposition (HIGH-grade; see ops/high_precision.py)
    for the quant formats — Mosaic has no native HIGH and HIGHEST's 6
    passes measured 691 img/s train at ViT-S/16."""
    if dims is None:
        dims = (((a.ndim - 1,), (0,)), ((), ()))
    if qspec is not None:
        return dot_high3(a, b, dims)
    # pin DEFAULT for non-fp32 operands: the env's matmul-precision
    # default (true-fp32 recipe) is illegal under Mosaic for bf16
    # operands and a numerical no-op (bf16 products are exact in fp32)
    precision = (
        None if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=precision,
    )


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


def _recip_f32(y):
    """Reciprocal via the fast approximate unit + one Newton step
    (relative error ~2^-24, i.e. fp32 roundoff).  The true fp32 divide
    runs on the low-throughput transcendental unit and measured ~10% of
    the whole fused-MLP forward at ViT-S batch 512; this recovers it
    with FMAs.  Interpret mode (CPU tests) keeps the exact divide so
    golden values are bit-stable."""
    if _interpret():
        return 1.0 / y
    r = pl.reciprocal(y, approx=True)
    return r * (2.0 - y * r)


def _erf_f32(x, recip=None):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7) — Pallas TPU
    has no erf lowering; this is exact at bf16 activation resolution."""
    recip = recip or _recip_f32
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = recip(1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(h, recip=None):
    hf = h.astype(jnp.float32)
    return 0.5 * hf * (1.0 + _erf_f32(hf / _SQRT_2, recip))


def _exact_div(y):
    return 1.0 / y


def gelu_erf_poly(x):
    """Polynomial-erf GELU with EXACT division — the quantized-format
    GELU, shared by the fused quant kernels and the unfused QGelu
    (models/vit.py) so the two paths agree bit for bit.  The 1.5e-7 erf
    polynomial error sits ~3 decades below the formats' 11-bit mantissa
    resolution; the true-fp32 FP32 diagnostic path keeps jax.nn.gelu."""
    return _gelu_f32(x, recip=_exact_div)


def _gelu_and_grad_f32(h, recip=None):
    """(gelu(h), gelu'(h)) sharing ONE erf evaluation — the backward
    needs both, and erf (poly + reciprocal + exp) dominates the VPU cost
    of the recompute."""
    hf = h.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_f32(hf / _SQRT_2, recip))
    pdf = jnp.exp(-0.5 * jax.lax.square(hf)) * 0.3989422804014327
    return hf * cdf, cdf + hf * pdf


def _fwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                *others, group, qspec, res_scale=1.0):
    if qspec == "int8":
        qs_ref, o_ref = others[0], others[1]
    else:
        qs_ref, o_ref = None, others[0]
    scale = s_ref[...].astype(jnp.float32)
    bias = b_ref[...].astype(jnp.float32)

    def fc1(j):
        x = x_ref[j]  # (N, C)
        # ffn_norm.act_in (pre_linear) / act_out (post_op) /
        # fc1.act_in (pre_linear) sites
        xn, _, _ = _layernorm_f32(_snap(x, qspec), scale, bias)
        xn = _snap(_snap_all(xn, qspec), qspec)
        xn = _snap_int8(xn, qspec, qs_ref, 0)  # ffn_norm.act_out
        xn = xn.astype(x.dtype)
        h = _mm(xn, w1_ref[...], qspec) + b1_ref[...].astype(jnp.float32)
        # fc1.act_out (post_op) + gelu.act_in (gelu_in) sites
        return _snap_int8(_snap_all(h, qspec), qspec, qs_ref, 1)

    def fc2(j, g):
        x = x_ref[j]
        y = (
            _mm(g, w2_ref[...], qspec)
            + b2_ref[...].astype(jnp.float32)
        )
        y = _snap_all(y, qspec)  # fc2.act_out (post_op)
        y = _snap_int8(y, qspec, qs_ref, 3)
        out = x.astype(jnp.float32) * res_scale + y
        out = _snap_all(out, qspec)  # ffn_res (functional)
        out = _snap_int8(out, qspec, qs_ref, 4)
        o_ref[j] = out.astype(o_ref.dtype)

    def gelu(h):
        if qspec == "int8":
            # gelu.act_out (gelu_out site) after the shared polynomial
            # GELU — same position as the discrete QGelu
            return _snap_int8(gelu_erf_poly(h), qspec, qs_ref, 2)
        if qspec is not None:
            # gelu_out + fc2.act_in sites around the shared exact-divide
            # polynomial GELU (see gelu_erf_poly)
            g = gelu_erf_poly(h)
            return _snap(_snap_all(g, qspec), qspec)
        return _gelu_f32(h)

    # software-pipelined over images: fc1 of image j+1 (MXU) is issued
    # before the GELU of image j (VPU) so the units overlap (measured
    # ~6% at ViT-S batch 512)
    h_prev = fc1(0)
    for j in range(group):
        h_next = fc1(j + 1) if j + 1 < group else None
        fc2(j, gelu(h_prev).astype(x_ref.dtype))
        h_prev = h_next


def _bwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                do_ref, *others, group, qspec, res_scale=1.0):
    if qspec == "int8":
        qs_ref, rest = others[0], others[1:]
    else:
        qs_ref, rest = None, others
    (dx_ref, ds_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = rest
    i = pl.program_id(0)
    scale = s_ref[...].astype(jnp.float32)
    bias = b_ref[...].astype(jnp.float32)

    def recompute(j):
        """Stage A: LN + fc1 recompute for image j (MXU-heavy), with the
        quant-path snaps at the same sites as the forward."""
        x = x_ref[j]
        ln_out, xhat, rstd = _layernorm_f32(_snap(x, qspec), scale, bias)
        ln_out = _snap(_snap_all(ln_out, qspec), qspec)
        ln_out = _snap_int8(ln_out, qspec, qs_ref, 0)
        xn = ln_out.astype(x.dtype)
        h = (
            _mm(xn, w1_ref[...], qspec)
            + b1_ref[...].astype(jnp.float32)
        )
        return xn, xhat, rstd, _snap_int8(
            _snap_all(h, qspec), qspec, qs_ref, 1
        )

    # software-pipelined over images: image j+1's LN+fc1 recompute (MXU)
    # is issued before image j's GELU+grad evaluation (VPU)
    acc = None
    a_prev = recompute(0)
    for j in range(group):
        a_next = recompute(j + 1) if j + 1 < group else None
        grads = _bwd_one_image(
            x_ref[j], do_ref[j].astype(jnp.float32), scale, bias,
            w1_ref, w2_ref, dx_ref, j, a_prev, qspec, res_scale,
            qs_ref,
        )
        acc = grads if acc is None else tuple(
            a + g for a, g in zip(acc, grads)
        )
        a_prev = a_next
    dscale, dbias_ln, dw1, db1, dw2, db2 = acc

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
    db1_ref[...] += db1
    dw2_ref[...] += dw2
    db2_ref[...] += db2


def _bwd_one_image(x, do, scale, bias, w1_ref, w2_ref, dx_ref, j,
                   recomputed, qspec=None, res_scale=1.0, qs_ref=None):
    # forward intermediates recomputed by the pipelined stage A
    xn, xhat, rstd, h = recomputed
    if qspec is not None:
        g_f32, ggrad = _gelu_and_grad_f32(h, recip=_exact_div)
        # gelu_out + fc2.act_in snaps: dw2 contracts against the actual
        # fc2 input; the sites are straight-through for dg/dh
        g_f32 = _snap(_snap_all(g_f32, qspec), qspec)
        g_f32 = _snap_int8(g_f32, qspec, qs_ref, 2)
    else:
        g_f32, ggrad = _gelu_and_grad_f32(h)
    g = g_f32.astype(x.dtype)

    dob = do.astype(x.dtype)
    # fc2 backward (contractions written to avoid explicit transposes)
    dw2 = _mm(g, dob, qspec, dims=(((0,), (0,)), ((), ())))
    dg = _mm(dob, w2_ref[...], qspec, dims=(((1,), (1,)), ((), ())))
    dh = dg * ggrad
    dhb = dh.astype(x.dtype)
    # fc1 backward
    dw1 = _mm(xn, dhb, qspec, dims=(((0,), (0,)), ((), ())))
    dxn = _mm(dhb, w1_ref[...], qspec, dims=(((1,), (1,)), ((), ())))
    # LayerNorm backward (wrt pre-norm x)
    dscale = jnp.sum(dxn * xhat, axis=0)
    dbias_ln = jnp.sum(dxn, axis=0)
    dxhat = dxn * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)

    dx_ref[j] = (do * res_scale + dx_ln).astype(dx_ref.dtype)
    return (dscale, dbias_ln, dw1, jnp.sum(dh, axis=0), dw2,
            jnp.sum(do, axis=0))


def _group(b: int, n: int, d: int, hidden: int, env_key: str,
           default_rows: int, bwd: bool) -> int:
    """Images per grid step: as many as keep ~default_rows rows in
    flight (~800 rows measures best on v5e at ViT-S/16 batch 512:
    train 3262 -> 3309 img/s vs the ~400-row default), bounded by batch
    divisibility AND by the per-kernel VMEM ceiling — the backward's
    unrolled loop keeps ~3 fp32 copies of the (N, hidden) activation
    live per image, and at ViT-Base dims the fp32 weight-grad
    accumulators alone take ~19MB.  MVT_MLP_{FWD,BWD}_GROUP override."""
    env = os.environ.get(env_key)
    if env:
        g = int(env)
        return g if b % g == 0 else 1
    if d < 256:
        # ViT-Tiny sweep (v5e, B=512): fwd g=16 1.04 ms vs g=8 1.08;
        # bwd g=8 1.90 ms vs g=4 1.94 — small tiles want 2x the rows.
        default_rows *= 2
    copies = 3 if bwd else 2
    per_image = copies * n * hidden * 4 + 3 * n * d * 4
    fixed = 2 * d * hidden * (2 + (4 if bwd else 0)) + (
        2 * b * n * d * 2  # in/out (+do) block double-buffering share
    ) // max(b, 1)
    budget = max(52 * 1024 * 1024 - fixed, per_image)
    target = min(default_rows // max(n, 1), budget // per_image)
    g = 1
    while g * 2 <= min(max(target, 1), b) and b % (g * 2) == 0:
        g *= 2
    return g


def _specs(g, n, d, hidden):
    row = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    vec_h = pl.BlockSpec((hidden,), lambda i: (0,),
                         memory_space=pltpu.VMEM)
    w1 = pl.BlockSpec((d, hidden), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    w2 = pl.BlockSpec((hidden, d), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    return row, vec_d, vec_h, w1, w2


def _as_3d(x):
    """(…, N, C) -> (B, N, C) without crossing tile boundaries (only
    leading dims are merged; the minor two axes are untouched)."""
    if x.ndim == 2:
        return x[None], x.shape
    if x.ndim == 3:
        return x, x.shape
    return x.reshape(-1, *x.shape[-2:]), x.shape


def _mlp_forward(x, scale, bias, w1, b1, w2, b2, qspec=None,
                 res_scale=1.0, qs=None):
    x3, orig_shape = _as_3d(x)
    b, n, d = x3.shape
    hidden = w1.shape[-1]
    # ~1600 rows -> g=8 at ViT-S/16: measured 2.18ms vs 2.23ms (g=4)
    # per block-forward at batch 512 after the pipelined-loop rework
    g = _group(b, n, d, hidden, "MVT_MLP_FWD_GROUP", 1600, bwd=False)
    row, vec_d, vec_h, w1s, w2s = _specs(g, n, d, hidden)
    wd = x.dtype
    in_specs = [row, vec_d, vec_d, w1s, vec_h, w2s, vec_d]
    extra_in = ()
    if qspec == "int8":
        in_specs.append(
            pl.BlockSpec(qs.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        extra_in = (qs.astype(jnp.float32),)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, group=g, qspec=qspec, res_scale=res_scale
        ),
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x3, scale.astype(wd), bias.astype(wd), w1.astype(wd),
      b1.astype(wd), w2.astype(wd), b2.astype(wd), *extra_in)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mlp_block(x, scale, bias, w1, b1, w2, b2, qspec=None,
                    res_scale=1.0):
    """x*res_scale + fc2(gelu(fc1(LN(x)))) over (..., N, D) with weights
    (D, H), (H, D).

    Params may be fp32; compute runs in x.dtype with fp32 accumulation,
    matching the unfused QLayerNorm/QDense/QGelu composition in FP32 mode.
    ``qspec``: None or the static (exp_bits, man_bits, all_sites) of a
    stateless quant format — weights must arrive already fake-quantized.

    Tensor parallelism (hidden-sharded): pass the LOCAL slices w1
    (D, H/n_tp), b1 (H/n_tp,), w2 (H/n_tp, D), b2 pre-scaled by 1/n_tp
    and ``res_scale = 1/n_tp``; psum over the model axis reassembles
    x + fc2 + bias exactly (models/vit.py Block TP path).
    """
    return _mlp_forward(x, scale, bias, w1, b1, w2, b2, qspec, res_scale)


def _fwd_rule(x, scale, bias, w1, b1, w2, b2, qspec, res_scale):
    out = _mlp_forward(x, scale, bias, w1, b1, w2, b2, qspec, res_scale)
    return out, (x, scale, bias, w1, b1, w2, b2)


def _bwd_rule(qspec, res_scale, res, do, qs=None):
    x, scale, bias, w1, b1, w2, b2 = res
    x3, orig_shape = _as_3d(x)
    do3, _ = _as_3d(do)
    b, n, d = x3.shape
    hidden = w1.shape[-1]
    g = _group(b, n, d, hidden, "MVT_MLP_BWD_GROUP", 800, bwd=True)
    row, vec_d, vec_h, w1s, w2s = _specs(g, n, d, hidden)
    wd = x.dtype

    in_specs = [row, vec_d, vec_d, w1s, vec_h, w2s, vec_d, row]
    extra_in = ()
    if qspec == "int8":
        in_specs.append(
            pl.BlockSpec(qs.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        extra_in = (qs.astype(jnp.float32),)
    f32 = jnp.float32
    dx, dscale, dbias, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(
            _bwd_kernel, group=g, qspec=qspec, res_scale=res_scale
        ),
        grid=(b // g,),
        in_specs=in_specs,
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
            jax.ShapeDtypeStruct(x3.shape, x.dtype),
            jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d, hidden), f32),
            jax.ShapeDtypeStruct((hidden,), f32),
            jax.ShapeDtypeStruct((hidden, d), f32),
            jax.ShapeDtypeStruct((d,), f32),
        ),
        # the grouped loop's live stack exceeds the 16MB default
        # scoped-vmem limit; v5e has 128MB, raise the per-kernel ceiling
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x3, scale.astype(wd), bias.astype(wd), w1.astype(wd),
      b1.astype(wd), w2.astype(wd), b2.astype(wd), do3, *extra_in)

    return (
        dx.reshape(orig_shape),
        dscale.astype(scale.dtype),
        dbias.astype(bias.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
    )


fused_mlp_block.defvjp(_fwd_rule, _bwd_rule)


# --------------------------------------------------------------------------
# Two-pass INT8 QAT variant (stateful observers frozen for the pass)
# --------------------------------------------------------------------------

@jax.custom_vjp
def fused_mlp_block_i8(x, scale, bias, w1, b1, w2, b2, qs):
    """:func:`fused_mlp_block` with PyTorchINT8 observer-site fake-quant
    applied in-kernel at the 5 stateful sites of the discrete path
    (models/vit.py Block): ffn_norm.act_out, fc1.act_out, gelu.act_out,
    fc2.act_out, ffn_res — rows 0-4 of ``qs`` (5, 3) = per-site
    (scale, zero_point, has_stats).  See
    fused_attention_block_i8's docstring for the two-pass QAT
    semantics; gradients treat the sites and ``qs`` as
    straight-through / constant, and weights must arrive already
    fake-quantized."""
    return _mlp_forward(x, scale, bias, w1, b1, w2, b2, qspec="int8",
                        qs=qs)


def _fwd_rule_i8(x, scale, bias, w1, b1, w2, b2, qs):
    out = _mlp_forward(x, scale, bias, w1, b1, w2, b2, qspec="int8",
                       qs=qs)
    return out, (x, scale, bias, w1, b1, w2, b2, qs)


def _bwd_rule_i8(res, do):
    *res_core, qs = res
    grads = _bwd_rule("int8", 1.0, tuple(res_core), do, qs=qs)
    return grads + (jnp.zeros_like(qs),)


fused_mlp_block_i8.defvjp(_fwd_rule_i8, _bwd_rule_i8)
