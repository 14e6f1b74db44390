#!/usr/bin/env python
"""Microbenchmark for fused-MLP forward kernel variants (ViT-S shapes).

The production kernel (ops/fused_mlp.py) measures ~51% of FLOP-ideal at
B=512: the exact-erf GELU costs a divide + an exp on every (N, 4C)
element through the low-throughput transcendental unit.  Variants probe
where the time goes and what an exact-semantics implementation can save:

  base     : production fused_mlp_block forward
  nogelu   : h passthrough (diagnostic: bounds ALL gelu cost)
  noexp    : erf poly without the exp term (diagnostic: exp cost)
  nodiv    : erf with t=1/(1+ax) replaced by a Newton-refined fast
             reciprocal (exact to ~2^-24 — semantics-preserving)
  pipe     : base with the image loop software-pipelined (fc1 of image
             j+1 issued before gelu of image j)

Run: python tools/perf/mlp_microbench.py [--iters 200]
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
_SQRT_2 = 1.4142135623730951

B, N, C = 512, 197, 384
M = 4 * C
PEAK = 197e12
FLOPS_IMG = 4 * N * C * M


def _interpret():
    return jax.default_backend() == "cpu"


def _ln_f32(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jax.lax.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + _EPS) * scale + bias


def _erf_variant(x, mode):
    s = jnp.sign(x)
    ax = jnp.abs(x)
    if mode == "nodiv":
        y = 1.0 + 0.3275911 * ax
        r = pl.reciprocal(y, approx=True)
        t = r * (2.0 - y * r)  # one Newton step: ~2^-24 relative
    else:
        t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    if mode == "noexp":
        return s * (1.0 - poly * 0.1)  # WRONG numerics — diagnostic
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(h, mode):
    hf = h.astype(jnp.float32)
    if mode == "nogelu":
        return hf
    return 0.5 * hf * (1.0 + _erf_variant(hf / _SQRT_2, mode))


def _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            o_ref, *, group, mode):
    scale = s_ref[...].astype(jnp.float32)
    bias = b_ref[...].astype(jnp.float32)

    def fc1(j):
        x = x_ref[j]
        xn = _ln_f32(x, scale, bias).astype(x.dtype)
        return jnp.dot(
            xn, w1_ref[...], preferred_element_type=jnp.float32
        ) + b1_ref[...].astype(jnp.float32)

    def fc2(j, g):
        x = x_ref[j]
        y = jnp.dot(
            g.astype(x.dtype), w2_ref[...],
            preferred_element_type=jnp.float32,
        ) + b2_ref[...].astype(jnp.float32)
        o_ref[j] = (x.astype(jnp.float32) + y).astype(o_ref.dtype)

    if mode == "pipe":
        h_prev = fc1(0)
        for j in range(group):
            h_next = fc1(j + 1) if j + 1 < group else None
            fc2(j, _gelu(h_prev, "base"))
            h_prev = h_next
    else:
        for j in range(group):
            fc2(j, _gelu(fc1(j), mode))


def _call(x, scale_ln, bias_ln, w1, b1, w2, b2, group, mode):
    row = pl.BlockSpec((group, N, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM)
    rep = lambda s: pl.BlockSpec(s, lambda i, nd=len(s): (0,) * nd,  # noqa
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, group=group, mode=mode),
        grid=(B // group,),
        in_specs=[row, vec_c, vec_c, rep((C, M)), rep((M,)),
                  rep((M, C)), vec_c],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(x, scale_ln, bias_ln, w1, b1, w2, b2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--group", type=int, default=0)
    ap.add_argument("--variants",
                    default="prod,base,nogelu,noexp,nodiv,pipe")
    args = ap.parse_args()

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, C), dt)
    scale_ln = jnp.ones((C,), dt)
    bias_ln = jnp.zeros((C,), dt)
    w1 = jax.random.normal(ks[1], (C, M), dt) * 0.05
    b1 = (jax.random.normal(ks[2], (M,), jnp.float32) * 0.01)
    w2 = jax.random.normal(ks[3], (M, C), dt) * 0.05
    b2 = (jax.random.normal(ks[4], (C,), jnp.float32) * 0.01)

    from myrtle_vision_tpu.ops.fused_mlp import fused_mlp_block

    g = args.group
    if not g:
        import os
        g = int(os.environ.get("MVT_MLP_FWD_ROWS", 0)) or 8

    variants = {"prod": lambda x: fused_mlp_block(
        x, scale_ln, bias_ln, w1, b1, w2, b2)}
    for mode in ("base", "nogelu", "noexp", "nodiv", "pipe"):
        variants[mode] = lambda x, m=mode: _call(
            x, scale_ln, bias_ln, w1, b1, w2, b2, g, m)

    ref = variants["prod"](x)
    for name in args.variants.split(","):
        if name in ("prod", "nogelu", "noexp"):
            continue
        err = jnp.max(jnp.abs(
            variants[name](x).astype(jnp.float32)
            - ref.astype(jnp.float32)))
        print(f"{name:8s} max|diff| vs prod = {float(err):.5f}")

    for name in args.variants.split(","):
        fn = variants[name]

        @jax.jit
        def loop(x, fn=fn):
            def body(carry, _):
                return fn(carry) * 0.5, None
            out, _ = jax.lax.scan(body, x, None, length=args.iters)
            return out

        loop(x).block_until_ready()
        t0 = time.perf_counter()
        loop(x).block_until_ready()
        dtm = (time.perf_counter() - t0) / args.iters
        util = FLOPS_IMG * B / dtm / PEAK
        print(f"{name:8s} {dtm*1e3:8.3f} ms/iter   util {util*100:5.1f}%")


if __name__ == "__main__":
    main()
