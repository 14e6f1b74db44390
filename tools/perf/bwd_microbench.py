#!/usr/bin/env python
"""Microbenchmark for the fused block kernels' BACKWARD passes at
ViT-S/16 shapes (B=512, N=197, C=384).  Times fwd-only and fwd+bwd for
the attention block and the MLP block; the difference is the backward
cost.  Group sizes come from the usual MVT_* env knobs so sweeps are:

  for g in 2 4 8; do MVT_ATTN_BWD_GROUP=$g python tools/perf/bwd_microbench.py --only attn; done

Ideal times at 197 TFLOP/s bf16: attn fwd 0.759ms / bwd ~1.52ms;
mlp fwd 1.208ms / bwd ~2.42ms.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, N, C, H = 512, 197, 384, 6
D = C // H
SCALE = D ** -0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--only", default="attn,mlp")
    args = ap.parse_args()

    from myrtle_vision_tpu.ops.fused_attention_block import (
        fused_attention_block,
    )
    from myrtle_vision_tpu.ops.fused_mlp import fused_mlp_block

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, C), dt)
    scale_ln = jnp.ones((C,), dt)
    bias_ln = jnp.zeros((C,), dt)
    wqkv = jax.random.normal(ks[1], (C, 3 * C), dt) * 0.05
    bqkv = jax.random.normal(ks[2], (3 * C,), jnp.float32) * 0.01
    wp = jax.random.normal(ks[3], (C, C), dt) * 0.05
    bp = jax.random.normal(ks[4], (C,), jnp.float32) * 0.01
    w1 = jax.random.normal(ks[5], (C, 4 * C), dt) * 0.05
    b1 = jnp.zeros((4 * C,), jnp.float32)
    w2 = jax.random.normal(ks[6], (4 * C, C), dt) * 0.05
    b2 = jnp.zeros((C,), jnp.float32)

    def attn(x):
        return fused_attention_block(
            x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, H, SCALE)

    def mlp(x):
        return fused_mlp_block(x, scale_ln, bias_ln, w1, b1, w2, b2)

    def timeit(name, fn, grad):
        if grad:
            gf = jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32)))

            def step(x):
                return (x - 0.001 * gf(x).astype(x.dtype)) * 0.5
        else:
            def step(x):
                return fn(x) * 0.5

        @jax.jit
        def loop(x):
            def body(carry, _):
                return step(carry), None
            out, _ = jax.lax.scan(body, x, None, length=args.iters)
            return out

        loop(x).block_until_ready()
        t0 = time.perf_counter()
        loop(x).block_until_ready()
        dtm = (time.perf_counter() - t0) / args.iters
        print(f"{name:14s} {dtm*1e3:8.3f} ms/iter")
        return dtm

    for which in args.only.split(","):
        fn = attn if which == "attn" else mlp
        f = timeit(f"{which} fwd", fn, grad=False)
        fb = timeit(f"{which} fwd+bwd", fn, grad=True)
        print(f"{which} bwd only   {1e3*(fb-f):8.3f} ms  (approx)")


if __name__ == "__main__":
    main()
