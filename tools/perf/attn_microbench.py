#!/usr/bin/env python
"""Microbenchmark for the fused attention-block forward kernel variants.

Times each variant standalone on the real chip at ViT-S/16 shapes
(B=512, N=197, C=384, H=6, D=64, bf16) and prints ms/iter plus achieved
utilization vs the pure-FLOP ideal (197 TFLOP/s bf16 on v5e).

Variant lineage (each builds on the previous):
  base     : production fused_attention_block forward (ops/fused_attention_block.py)
  pvrow    : PV emits (N, D) per head via transposed-v dots, heads concat to
             (N, C), projection becomes ONE full-util (N,C)@(C,C) dot
             (replaces 6 half-tile per-head proj dots + an (H,N,C) sum)
  rowmajor : pvrow + QKV as one (N,C)@(C,3C) row-major dot with per-head
             64-wide lane slices (88.5M MAC-slots vs 113M for the
             (3,H,C,D)x(N,C) form) + per-head unrolled score dots
             (interleaves VPU softmax with MXU dots across heads)
  defer    : rowmajor + softmax division deferred past PV (divide the
             (N,D) output instead of the (N,N) probabilities) + score
             scale folded into q (an (N,D) multiply instead of (N,N))

Run: python tools/perf/attn_microbench.py [--iters 50] [--batch 512]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

_EPS = 1e-5

B, N, C, H = 512, 197, 384, 6
D = C // H
SCALE = D ** -0.5
PEAK = 197e12

# attention block fwd FLOPs per image (matmul only)
FLOPS_IMG = (
    2 * N * C * 3 * C      # qkv
    + 4 * H * N * N * D    # scores + pv
    + 2 * N * C * C        # proj
)


def _interpret():
    return jax.default_backend() == "cpu"


def _ln_f32(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jax.lax.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    return (xf - mu) * rstd * scale + bias


# ---------------------------------------------------------------------------
# variant kernels (one grid step = `group` images)
# ---------------------------------------------------------------------------

def _qkv_heads(xn, w3):
    return jax.lax.dot_general(
        w3, xn, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_pvrow(x_ref, s_ref, b_ref, w3_ref, bq_ref, wp_ref, bp_ref,
                  o_ref, *, group):
    """v0 qkv/score layout; PV per head -> (N, D), concat, single proj."""
    scale_ln = s_ref[...].astype(jnp.float32)
    bias_ln = b_ref[...].astype(jnp.float32)
    for j in range(group):
        x = x_ref[j]
        xn = _ln_f32(x, scale_ln, bias_ln).astype(x.dtype)
        qkv = _qkv_heads(xn, w3_ref[...])
        qkv = (qkv + bq_ref[...][..., None]).astype(x.dtype)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (H, D, N)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * SCALE  # (H, N, N)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        outs = []
        for h in range(H):
            outs.append(jax.lax.dot_general(
                p[h], v[h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype))  # (N, D)
        o = jnp.concatenate(outs, axis=-1)  # (N, C)
        y = jax.lax.dot_general(
            o, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bp_ref[...].astype(jnp.float32)
        o_ref[j] = (x.astype(jnp.float32) + y).astype(o_ref.dtype)


def _kernel_rowmajor(x_ref, s_ref, b_ref, w_ref, bq_ref, wp_ref, bp_ref,
                     o_ref, *, group, defer, softmax="exact"):
    """qkv as one (N,C)@(C,3C) dot; per-head unrolled score/pv dots."""
    scale_ln = s_ref[...].astype(jnp.float32)
    bias_ln = b_ref[...].astype(jnp.float32)
    for j in range(group):
        x = x_ref[j]
        xn = _ln_f32(x, scale_ln, bias_ln).astype(x.dtype)
        qkv = jax.lax.dot_general(
            xn, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bq_ref[...].astype(jnp.float32)  # (N, 3C)
        qkv = qkv.astype(x.dtype)
        outs = []
        for h in range(H):
            qh = qkv[:, h * D:(h + 1) * D]
            kh = qkv[:, C + h * D:C + (h + 1) * D]
            vh = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
            if defer:
                qh = (qh.astype(jnp.float32) * SCALE).astype(x.dtype)
            s = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (N, N)
            if not defer:
                s = s * SCALE
            if softmax == "none":
                # diagnostic: no softmax at all -> pure-MXU floor
                e = s * 0.01
            elif softmax == "nomax":
                # diagnostic: skip the max-subtract stabilization
                e = jnp.exp(s)
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
            if softmax == "sumdot":
                # row-sum on the MXU via a ones-vector dot
                ssum = jax.lax.dot_general(
                    e.astype(x.dtype),
                    jnp.ones((s.shape[-1], 1), x.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (N, 1)
            else:
                ssum = jnp.sum(e, axis=-1, keepdims=True)
            if defer:
                oh = jax.lax.dot_general(
                    e.astype(x.dtype), vh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) / ssum
            else:
                p = (e / ssum).astype(x.dtype)
                oh = jax.lax.dot_general(
                    p, vh, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            outs.append(oh.astype(x.dtype))  # (N, D)
        o = jnp.concatenate(outs, axis=-1)  # (N, C)
        y = jax.lax.dot_general(
            o, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bp_ref[...].astype(jnp.float32)
        o_ref[j] = (x.astype(jnp.float32) + y).astype(o_ref.dtype)


def _kernel_dotonly(x_ref, s_ref, b_ref, w_ref, bq_ref, wp_ref, bp_ref,
                    o_ref, *, group):
    """Diagnostic: ONLY the matmuls (no LN, bias, softmax, residual) —
    the achievable MXU floor for the rowmajor dot sequence."""
    for j in range(group):
        x = x_ref[j]
        qkv = jax.lax.dot_general(
            x, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        outs = []
        for h in range(H):
            qh = qkv[:, h * D:(h + 1) * D]
            kh = qkv[:, C + h * D:C + (h + 1) * D]
            vh = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
            s = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            outs.append(jax.lax.dot_general(
                s, vh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype))
        o = jnp.concatenate(outs, axis=-1)
        y = jax.lax.dot_general(
            o, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[j] = y.astype(o_ref.dtype)


def _kernel_pipe(x_ref, s_ref, b_ref, w_ref, bq_ref, wp_ref, bp_ref,
                 o_ref, *, group):
    """rowmajor+defer with the head loop software-pipelined: the score
    dot of head h+1 is issued before the softmax of head h so the VLIW
    scheduler can overlap MXU and VPU work."""
    scale_ln = s_ref[...].astype(jnp.float32)
    bias_ln = b_ref[...].astype(jnp.float32)
    for j in range(group):
        x = x_ref[j]
        xn = _ln_f32(x, scale_ln, bias_ln).astype(x.dtype)
        qkv = jax.lax.dot_general(
            xn, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bq_ref[...].astype(jnp.float32)  # (N, 3C)
        qkv = qkv.astype(x.dtype)

        def score(h):
            qh = qkv[:, h * D:(h + 1) * D]
            kh = qkv[:, C + h * D:C + (h + 1) * D]
            qh = (qh.astype(jnp.float32) * SCALE).astype(x.dtype)
            return jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def soft(s):
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            return e, jnp.sum(e, axis=-1, keepdims=True)

        def pv(e, ssum, h):
            vh = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
            return (jax.lax.dot_general(
                e.astype(x.dtype), vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / ssum).astype(x.dtype)

        outs = []
        s_prev = score(0)
        e_prev, sum_prev = None, None
        for h in range(H):
            # stage order per iteration: issue next score (MXU), then
            # softmax of the previous (VPU), then its PV (MXU)
            s_next = score(h + 1) if h + 1 < H else None
            e_prev, sum_prev = soft(s_prev)
            outs.append(pv(e_prev, sum_prev, h))
            s_prev = s_next
        o = jnp.concatenate(outs, axis=-1)  # (N, C)
        y = jax.lax.dot_general(
            o, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bp_ref[...].astype(jnp.float32)
        o_ref[j] = (x.astype(jnp.float32) + y).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def _call(kernel, x, scale_ln, bias_ln, extras, group):
    row = pl.BlockSpec((group, N, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM)
    in_specs = [row, vec_c, vec_c] + [
        pl.BlockSpec(e.shape, lambda i, nd=e.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for e in extras[:-1]
    ] + [vec_c]
    return pl.pallas_call(
        kernel,
        grid=(B // group,),
        in_specs=in_specs,
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(x, scale_ln, bias_ln, *extras)


def time_variant(name, fn, x, iters):
    @jax.jit
    def loop(x):
        def body(carry, _):
            # rescale so values stay bounded across iterations (residual
            # blocks grow the carry; unbounded bf16 values overflow)
            return fn(carry) * 0.5, None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    loop(x).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    util = FLOPS_IMG * B / dt / PEAK
    print(f"{name:10s} {dt*1e3:8.3f} ms/iter   util {util*100:5.1f}%  "
          f"({B/dt:9.0f} img/s attn-block-only)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--variants", default="base,pvrow,rowmajor,defer")
    args = ap.parse_args()

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, C), dt)
    scale_ln = jnp.ones((C,), dt)
    bias_ln = jnp.zeros((C,), dt)
    wqkv = (jax.random.normal(ks[1], (C, 3 * C), jnp.float32) * 0.05)
    bqkv = jax.random.normal(ks[2], (3 * C,), jnp.float32) * 0.01
    wp = (jax.random.normal(ks[3], (C, C), jnp.float32) * 0.05)
    bp = jax.random.normal(ks[4], (C,), jnp.float32) * 0.01

    w3 = wqkv.reshape(C, 3, H, D).transpose(1, 2, 0, 3).astype(dt)
    bq3 = bqkv.reshape(3, H, D).astype(jnp.float32)
    g = args.group

    from myrtle_vision_tpu.ops.fused_attention_block import (
        fused_attention_block,
    )

    variants = {}
    variants["base"] = lambda x: fused_attention_block(
        x, scale_ln, bias_ln, wqkv.astype(dt), bqkv, wp.astype(dt),
        bp, H, SCALE)
    variants["pvrow"] = lambda x: _call(
        functools.partial(_kernel_pvrow, group=g),
        x, scale_ln, bias_ln,
        [w3, bq3, wp.astype(dt), bp.astype(dt)], g)
    variants["rowmajor"] = lambda x: _call(
        functools.partial(_kernel_rowmajor, group=g, defer=False),
        x, scale_ln, bias_ln,
        [wqkv.astype(dt), bqkv.astype(jnp.float32), wp.astype(dt),
         bp.astype(dt)], g)
    variants["defer"] = lambda x: _call(
        functools.partial(_kernel_rowmajor, group=g, defer=True),
        x, scale_ln, bias_ln,
        [wqkv.astype(dt), bqkv.astype(jnp.float32), wp.astype(dt),
         bp.astype(dt)], g)
    def _xla_attn(x):
        """Whole attention block in plain XLA ops (no Pallas)."""
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + _EPS)
              * scale_ln.astype(jnp.float32)
              + bias_ln.astype(jnp.float32)).astype(x.dtype)
        qkv = (jnp.einsum("bnc,ck->bnk", xn, wqkv.astype(dt),
                          preferred_element_type=jnp.float32)
               + bqkv).reshape(B, N, 3, H, D)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3).astype(dt)
                   for i in range(3)]
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * SCALE
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(dt), v,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C).astype(dt)
        y = jnp.einsum("bnc,ck->bnk", o, wp.astype(dt),
                       preferred_element_type=jnp.float32) + bp
        return (x.astype(jnp.float32) + y).astype(x.dtype)

    def _xla_mlp(x):
        w1 = jax.random.normal(ks[5], (C, 4 * C), dt) * 0.05
        w2 = jax.random.normal(ks[6], (4 * C, C), dt) * 0.05
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + _EPS)
              * scale_ln.astype(jnp.float32)
              + bias_ln.astype(jnp.float32)).astype(x.dtype)
        h = jnp.einsum("bnc,ck->bnk", xn, w1,
                       preferred_element_type=jnp.float32)
        g = jax.nn.gelu(h, approximate=False).astype(dt)
        y = jnp.einsum("bnk,kc->bnc", g, w2,
                       preferred_element_type=jnp.float32)
        return (x.astype(jnp.float32) + y).astype(x.dtype)

    variants["xlaattn"] = _xla_attn
    variants["xlamlp"] = _xla_mlp
    variants["dotonly"] = lambda x: _call(
        functools.partial(_kernel_dotonly, group=g),
        x, scale_ln, bias_ln,
        [wqkv.astype(dt), bqkv.astype(jnp.float32), wp.astype(dt),
         bp.astype(dt)], g)

    def _mlp(x):
        from myrtle_vision_tpu.ops.fused_mlp import fused_mlp_block
        w1 = jax.random.normal(ks[5], (C, 4 * C), dt) * 0.05
        b1 = jnp.zeros((4 * C,), jnp.float32)
        w2 = jax.random.normal(ks[6], (4 * C, C), dt) * 0.05
        b2 = jnp.zeros((C,), jnp.float32)
        return fused_mlp_block(x, scale_ln, bias_ln, w1, b1, w2, b2)

    variants["mlp"] = _mlp  # calibration: ideal = 4*N*C*4C FLOPs
    variants["pipe"] = lambda x: _call(
        functools.partial(_kernel_pipe, group=g),
        x, scale_ln, bias_ln,
        [wqkv.astype(dt), bqkv.astype(jnp.float32), wp.astype(dt),
         bp.astype(dt)], g)
    for sm in ("none", "nomax", "sumdot"):
        variants[sm] = lambda x, sm=sm: _call(
            functools.partial(_kernel_rowmajor, group=g, defer=True,
                              softmax=sm),
            x, scale_ln, bias_ln,
            [wqkv.astype(dt), bqkv.astype(jnp.float32), wp.astype(dt),
             bp.astype(dt)], g)

    # numerics check vs base (bf16 tolerance)
    ref = variants["base"](x)
    for name in args.variants.split(","):
        if name == "base":
            continue
        out = variants[name](x)
        err = jnp.max(jnp.abs(out.astype(jnp.float32)
                              - ref.astype(jnp.float32)))
        print(f"{name:10s} max|diff| vs base = {float(err):.4f}")

    for name in args.variants.split(","):
        time_variant(name, variants[name], x, args.iters)


if __name__ == "__main__":
    main()
