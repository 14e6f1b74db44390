"""Fused converted-INT8 transformer block kernels (inference only).

The converted PyTorchINT8 model (reference quantize.py:329-348 intent;
the reference's own convert crashes on its ViT — BASELINE row 3) stores
linear weights as REAL int8 and executes the projections as
int8 x int8 -> int32 MXU dots.  The unfused composition (models/vit.py
QDense._int8_forward + ActQuant sites) round-trips every one of the ~10
per-block observer sites through HBM, which left deployment inference at
1954 img/s vs 12751 bf16 (round-3 BASELINE throughput table).  These
kernels run each block half as ONE Pallas program, keeping every requant
in VMEM:

  attention: LN -> [requant+int8] -> i8 dot W_qkv -> rescale -> requant
             -> fp32 high3 softmax core (the reference's quantization
             boundary keeps the core in fp32, vit.py:78-97)
             -> [requant+int8] -> i8 dot W_out -> rescale -> requant
             -> +x -> requant
  mlp:       LN -> [requant+int8] -> i8 dot W1 -> rescale -> requant
             -> GELU -> [requant+int8] -> i8 dot W2 -> rescale
             -> requant -> +x -> requant

Numerics match the unfused converted path op for op:
  - requant sites use the exact uint8 affine snap
    (ops/fake_quant.int8_affine_fake_quant: clip(rint(x/s)+zp, 0, 255)
    with a true fp32 divide);
  - [requant+int8] fuses a site's requant with the following integer
    dot's quantization: both need the SAME q = clip(rint(x/s)+zp), so q
    is computed once (bit-identical to the unfused sequence, which
    requantizes to (q-zp)*s and then recovers q with another
    rint-divide);
  - the integer dots use the shifted-zero-point identity of
    QDense._int8_forward: y = s_x*s_w*((q-128) @ k8 + (128-zp)*colsum)
    with colsum precomputed from the stored int8 kernel;
  - the fp32 attention core runs the 3-pass HIGH-grade dots
    (ops/high_precision.dot_high3) and an exact-divide softmax — the
    same ops as multi_head_attention's xla impl (ops/attention.py:63-94);
  - GELU is the polynomial-erf shared with the fused float-format
    kernels (ops/fused_mlp.gelu_erf_poly).  The unfused INT8 path uses
    jax.nn.gelu (exact erf); the 1.5e-7 polynomial error can flip a
    rint at the immediately following gelu_out requant only when a
    value sits within 1.5e-7 of a rounding boundary — empirically <1e-4
    of elements, each off by one uint8 grid step (tests/test_convert.py
    pins the fused-vs-unfused agreement).

Observer statistics: a converted deployment model is always calibrated.
If a site somehow has no stats the requants pass values through
unchanged (same ``has_stats`` select as ActQuant) and the integer dots
use a guard scale of 1.0 — the unfused path's fp32-matmul fallback is
NOT replicated in-kernel (it would compile a second full matmul per
site); models/vit.py only routes to these kernels for converted
(post-calibration) inference.

No backward: converted models are a deployment format and never train.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myrtle_vision_tpu.ops.fused_mlp import (
    _exact_div,
    _gelu_f32,
    _layernorm_f32,
)
_EPS = 1e-5


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _site(qp_ref, i):
    """(scale, zero_point, has_stats) scalars for site i from the packed
    (n_sites, 3) fp32 observer-parameter array."""
    return qp_ref[i, 0], qp_ref[i, 1], qp_ref[i, 2]


def _requant(x, s, zp, has):
    """uint8 affine fake-quant, identical to ActQuant's post-calibration
    behavior (ops/fake_quant.int8_affine_fake_quant + has_stats select)."""
    q = jnp.clip(jnp.rint(x / s) + zp, 0.0, 255.0)
    return jnp.where(has > 0.5, (q - zp) * s, x)


def _quantize_i8(x, s, zp, has):
    """The site's uint8 grid q, shifted to int8 for the MXU dot.
    Shares the rint with the requant the unfused path would apply at the
    same site (QDense._int8_forward recovers exactly this q)."""
    s_safe = jnp.where(has > 0.5, s, 1.0)
    zp_safe = jnp.where(has > 0.5, zp, 128.0)
    q = jnp.clip(jnp.rint(x / s_safe) + zp_safe, 0.0, 255.0)
    return (q - 128.0).astype(jnp.int8), s_safe, zp_safe


def _split_bf16(x):
    """fp32 -> (hi, lo) bf16 pair, hi + lo ~= x (ops/high_precision._split)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3_packed_qk(a, b):
    """3-pass fp32 score contraction sum_d a[n,d] b[m,d] as ONE MXU dot.

    dot_high3 issues three K=64 dots (half-tile contraction on the
    128-wide MXU, ~50% utilization each); packing the passes along the
    contraction axis — [ah | al | ah] . [bh | bh | bl] — computes the
    same three bf16 products (ah.bh + al.bh + ah.bl) in a single K=3D
    dot (192 -> one-and-a-half tiles, ~75% utilization).  The fp32
    accumulation ORDER differs from dot_high3's (d1+d2)+d3, so outputs
    agree to fp32 roundoff rather than bitwise — inside this kernel the
    result feeds a softmax and then a uint8 requant, which
    tests/test_convert.py bounds at 1e-4 alongside the GELU polynomial."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    a3 = jnp.concatenate([ah, al, ah], axis=1)
    b3 = jnp.concatenate([bh, bh, bl], axis=1)
    return jax.lax.dot_general(
        a3, b3,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,  # bf16 operands: env
        # matmul-precision defaults are illegal under Mosaic + no-op
    )


def _dot3_packed_pv(p, v):
    """3-pass fp32 sum_m p[n,m] v[m,d] as ONE MXU dot (see
    _dot3_packed_qk; packing [ph | pl | ph] @ [vh ; vh ; vl])."""
    ph, pl = _split_bf16(p)
    vh, vl = _split_bf16(v)
    p3 = jnp.concatenate([ph, pl, ph], axis=1)
    v3 = jnp.concatenate([vh, vh, vl], axis=0)
    return jax.lax.dot_general(
        p3, v3,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _i8_dot(q8, w8_ref, colsum_ref, w_scale, s_x, zp, bias_ref):
    """int8 x int8 -> int32 projection + affine correction + bias
    (QDense._int8_forward's shifted-zero-point identity)."""
    acc = jax.lax.dot_general(
        q8, w8_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # int8 operands
    ).astype(jnp.float32)
    return (s_x * w_scale) * (
        acc + (128.0 - zp) * colsum_ref[...]
    ) + bias_ref[...]


def _attn_kernel(x_ref, s_ref, b_ref, w_ref, cs_ref, bq_ref,
                 wp_ref, csp_ref, bp_ref, qp_ref, sc_ref,
                 o_ref, *, heads, scale, group):
    """Sites in qp_ref rows: 0=attn_norm.act_out (post_op),
    1=to_qkv.act_out (post_op), 2=quant_out (stub),
    3=to_out.act_out (post_op), 4=attn_res (functional)."""
    ln_scale = s_ref[...]
    ln_bias = b_ref[...]
    sw_qkv = sc_ref[0]
    sw_out = sc_ref[1]
    for j in range(group):
        xf = x_ref[j].astype(jnp.float32)  # (N, C)
        ln, _, _ = _layernorm_f32(xf, ln_scale, ln_bias)
        s0, zp0, h0 = _site(qp_ref, 0)
        q8, s0s, zp0s = _quantize_i8(ln, s0, zp0, h0)
        qkv = _i8_dot(q8, w_ref, cs_ref, sw_qkv, s0s, zp0s, bq_ref)
        s1, zp1, h1 = _site(qp_ref, 1)
        qkv = _requant(qkv, s1, zp1, h1)

        # fp32 softmax core: the same three bf16 passes as the xla
        # impl's dot_high3, packed into single MXU dots
        # (_dot3_packed_qk/_pv), exact-divide softmax
        c = qkv.shape[-1] // 3
        d = c // heads
        outs = []
        for h in range(heads):
            q = qkv[:, h * d:(h + 1) * d]
            k = qkv[:, c + h * d:c + (h + 1) * d]
            v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
            s = _dot3_packed_qk(q, k) * jnp.float32(scale)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(_dot3_packed_pv(p, v))
        ctx = jnp.concatenate(outs, axis=-1)  # (N, C)

        s2, zp2, h2 = _site(qp_ref, 2)
        o8, s2s, zp2s = _quantize_i8(ctx, s2, zp2, h2)
        out = _i8_dot(o8, wp_ref, csp_ref, sw_out, s2s, zp2s, bp_ref)
        s3, zp3, h3 = _site(qp_ref, 3)
        out = _requant(out, s3, zp3, h3)

        s4, zp4, h4 = _site(qp_ref, 4)
        o_ref[j] = _requant(out + xf, s4, zp4, h4).astype(o_ref.dtype)


def _mlp_kernel(x_ref, s_ref, b_ref, w1_ref, cs1_ref, b1_ref,
                w2_ref, cs2_ref, b2_ref, qp_ref, sc_ref,
                o_ref, *, group):
    """Sites in qp_ref rows: 0=ffn_norm.act_out (post_op),
    1=fc1.act_out (post_op), 2=gelu.act_out (gelu_out),
    3=fc2.act_out (post_op), 4=ffn_res (functional)."""
    ln_scale = s_ref[...]
    ln_bias = b_ref[...]
    sw1 = sc_ref[0]
    sw2 = sc_ref[1]
    for j in range(group):
        xf = x_ref[j].astype(jnp.float32)
        ln, _, _ = _layernorm_f32(xf, ln_scale, ln_bias)
        s0, zp0, h0 = _site(qp_ref, 0)
        q8, s0s, zp0s = _quantize_i8(ln, s0, zp0, h0)
        h = _i8_dot(q8, w1_ref, cs1_ref, sw1, s0s, zp0s, b1_ref)
        s1, zp1, h1 = _site(qp_ref, 1)
        h = _requant(h, s1, zp1, h1)

        g = _gelu_f32(h, recip=_exact_div)
        s2, zp2, h2 = _site(qp_ref, 2)
        g8, s2s, zp2s = _quantize_i8(g, s2, zp2, h2)
        y = _i8_dot(g8, w2_ref, cs2_ref, sw2, s2s, zp2s, b2_ref)
        s3, zp3, h3 = _site(qp_ref, 3)
        y = _requant(y, s3, zp3, h3)

        s4, zp4, h4 = _site(qp_ref, 4)
        o_ref[j] = _requant(y + xf, s4, zp4, h4).astype(o_ref.dtype)


def _group(b: int, env_key: str) -> int:
    """Images per grid step.  fp32 activations double the per-image VMEM
    stack vs the bf16 kernels; default 4 (env override)."""
    env = os.environ.get(env_key)
    g = int(env) if env else 4
    while g > 1 and b % g:
        g //= 2
    return max(g, 1)


def _pack_sites(sites):
    """[(scale, zp, has_stats)...] -> (n, 3) fp32 array."""
    rows = [
        jnp.stack([
            jnp.asarray(s, jnp.float32).reshape(()),
            jnp.asarray(zp, jnp.float32).reshape(()),
            jnp.asarray(has, jnp.float32).reshape(()),
        ])
        for (s, zp, has) in sites
    ]
    return jnp.stack(rows)


def _colsum(w8):
    return jnp.sum(w8.astype(jnp.int32), axis=0).astype(jnp.float32)


def int8_attention_block(x, ln_scale, ln_bias, wqkv_i8, wqkv_scale,
                         bqkv, wout_i8, wout_scale, bout, sites,
                         heads, scale):
    """x + to_out(core(to_qkv(LN(x)))) with int8 MXU projections.

    wqkv_i8 (C, 3C) / wout_i8 (C, C): REAL int8 kernels (convert_params);
    *_scale: their symmetric per-tensor scales; sites: five
    (scale, zero_point, has_stats) observer tuples in kernel-site order
    (see _attn_kernel).  Returns (B, N, C) in x.dtype.
    """
    b, n, c = x.shape
    g = _group(b, "MVT_INT8_ATTN_GROUP")
    qp = _pack_sites(sites)
    scales = jnp.stack([
        jnp.asarray(wqkv_scale, jnp.float32).reshape(()),
        jnp.asarray(wout_scale, jnp.float32).reshape(()),
    ])
    row = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _attn_kernel, heads=heads, scale=scale, group=g
        ),
        grid=(b // g,),
        in_specs=[
            row, rep((c,)), rep((c,)),
            rep((c, 3 * c)), rep((3 * c,)), rep((3 * c,)),
            rep((c, c)), rep((c,)), rep((c,)),
            rep(qp.shape), rep((2,)),
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
      wqkv_i8, _colsum(wqkv_i8), bqkv.astype(jnp.float32),
      wout_i8, _colsum(wout_i8), bout.astype(jnp.float32), qp, scales)


def int8_mlp_block(x, ln_scale, ln_bias, w1_i8, w1_scale, b1,
                   w2_i8, w2_scale, b2, sites):
    """x + fc2(gelu(fc1(LN(x)))) with int8 MXU projections (see
    int8_attention_block)."""
    b, n, c = x.shape
    hidden = w1_i8.shape[-1]
    g = _group(b, "MVT_INT8_MLP_GROUP")
    qp = _pack_sites(sites)
    scales = jnp.stack([
        jnp.asarray(w1_scale, jnp.float32).reshape(()),
        jnp.asarray(w2_scale, jnp.float32).reshape(()),
    ])
    row = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_mlp_kernel, group=g),
        grid=(b // g,),
        in_specs=[
            row, rep((c,)), rep((c,)),
            rep((c, hidden)), rep((hidden,)), rep((hidden,)),
            rep((hidden, c)), rep((c,)), rep((c,)),
            rep(qp.shape), rep((2,)),
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
      w1_i8, _colsum(w1_i8), b1.astype(jnp.float32),
      w2_i8, _colsum(w2_i8), b2.astype(jnp.float32), qp, scales)
