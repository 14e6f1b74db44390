#!/usr/bin/env python
"""Sweep the fused-kernel image-group knobs on the real chip, one
process, sequentially (compiles are server-side and slow; a single
process reuses the compilation cache across points).

Run: python tools/perf/group_sweep.py [--dim 384 --heads 6 --batch 512]
(--dim 192 --heads 3 sweeps the ViT-Tiny shapes; --mlp_ratio 4 fixed.)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

ITERS = 100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seq", type=int, default=197)
    ap.add_argument("--mlp_ratio", type=int, default=4)
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--only", default="",
                    help="substring filter on point names")
    ap.add_argument("--groups", default="",
                    help="comma list overriding the swept group sizes")
    args = ap.parse_args()

    from myrtle_vision_tpu.ops.fused_attention_block import (
        fused_attention_block,
    )
    from myrtle_vision_tpu.ops.fused_mlp import fused_mlp_block

    B, N, C, H = args.batch, args.seq, args.dim, args.heads
    D = C // H
    SCALE = D ** -0.5
    iters = args.iters

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
    hidden = args.mlp_ratio * C
    w1 = jax.random.normal(ks[5], (C, hidden), dt) * 0.05
    b1 = jnp.zeros((hidden,), jnp.float32)
    w2 = jax.random.normal(ks[6], (hidden, C), dt) * 0.05
    b2 = jnp.zeros((C,), jnp.float32)

    def attn(x):
        return fused_attention_block(
            x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, H, SCALE)

    def mlp(x):
        return fused_mlp_block(x, scale_ln, bias_ln, w1, b1, w2, b2)

    def timeit(fn, grad):
        if grad:
            gf = jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32)))

            def step(x):
                return (x - 0.001 * gf(x).astype(x.dtype)) * 0.5
        else:
            def step(x):
                return fn(x) * 0.5

        def make_loop(length):
            @jax.jit
            def loop(x):
                def body(carry, _):
                    return step(carry), None
                out, _ = jax.lax.scan(body, x, None, length=length)
                return jnp.sum(out[0, 0, :8].astype(jnp.float32))
            return loop

        # block_until_ready() does NOT synchronize on this container's
        # axon client (round-4 finding) — only a host fetch does.  Time
        # two scan lengths and take the slope, cancelling all fixed
        # overhead (dispatch RTT, fetch, cache lookups).
        lo, hi = iters, iters * 3
        loop_lo, loop_hi = make_loop(lo), make_loop(hi)
        float(loop_lo(x))  # compile + warm
        float(loop_hi(x))
        t0 = time.perf_counter()
        float(loop_lo(x))
        t1 = time.perf_counter()
        float(loop_hi(x))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (hi - lo)

    points = [
        ("attn fwd", "MVT_ATTN_FWD_GROUP", attn, False, [4, 8, 16, 32]),
        ("attn bwd", "MVT_ATTN_BWD_GROUP", attn, True, [2, 4, 8, 16]),
        ("mlp fwd", "MVT_MLP_FWD_GROUP", mlp, False, [4, 8, 16, 32]),
        ("mlp bwd", "MVT_MLP_BWD_GROUP", mlp, True, [2, 4, 8, 16]),
    ]
    print(f"shapes: B={B} N={N} C={C} H={H} D={D} hidden={hidden}",
          flush=True)
    for name, env, fn, grad, gs in points:
        if args.only and args.only not in name:
            continue
        if args.groups:
            gs = [int(v) for v in args.groups.split(",")]
        for g in gs:
            os.environ[env] = str(g)
            try:
                dtm = timeit(fn, grad)
            except Exception as e:  # VMEM overflow at large groups
                msg = (str(e).splitlines() or ["<no message>"])[0][:80]
                print(f"{name:10s} g={g:<3d} FAILED: {msg}", flush=True)
                continue
            print(f"{name:10s} g={g:<3d} {dtm*1e3:8.3f} ms/iter",
                  flush=True)
        del os.environ[env]


if __name__ == "__main__":
    main()
