#!/usr/bin/env python
"""Attribute the converted-INT8 deployment inference time per component
(VERDICT r4 item 7: 3477 img/s @ b512 vs the 4500 target — the remaining
cost was ATTRIBUTED to the fp32 attention core + the unfused
patch-embed/head requant edges, but never measured).

Slope-times, on the real chip (block_until_ready does not synchronize on
this container's axon client — only host fetches drain the queue):

  full        converted model forward (bench.py MVT_BENCH_CONVERTED parity)
  attn_i8     one fused int8 attention block (ops/fused_int8_block.py)
  mlp_i8      one fused int8 mlp block
  core_fp32   the fp32 3-pass softmax core ALONE at the same (b,h,n,dh)
              shape via XLA (upper bound for the in-kernel core: the
              standalone version pays HBM io the fused kernel does not)
  bf16_attn   the bf16 fused attention block at the same shape (floor:
              what the block costs when nothing is quantized)
  bf16_mlp    the bf16 fused MLP block

Derived: edges = full - 12*(attn_i8 + mlp_i8)  <- patch-embed + pos add +
cls cat + decoder LN/head plus ALL their discrete requant sites.

Run: python tools/perf/int8_component_bench.py [--batch 512] [--iters 20]
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


def slope(loop_fn, x, iters):
    lo, hi = iters, iters * 3
    loop_lo, loop_hi = loop_fn(lo), loop_fn(hi)
    float(loop_lo(*x))
    float(loop_hi(*x))
    t0 = time.perf_counter()
    float(loop_lo(*x))
    t1 = time.perf_counter()
    float(loop_hi(*x))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (hi - lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    B = args.batch

    from myrtle_vision_tpu.models.vit import ViT
    from myrtle_vision_tpu.quantize import QFormat, convert_params

    kw = dict(
        decoder="classification", image_size=224, patch_size=16,
        num_classes=45, dim=384, depth=12, heads=6, mlp_dim=1536,
    )
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, 224, 224, 3), jnp.float32)

    # calibrate observers with one batch, then convert (bench.py parity)
    model_q = ViT(q_format=QFormat.PyTorchINT8, **kw)
    variables = model_q.init(rng, jnp.zeros((1, 224, 224, 3)))
    _, mut = model_q.apply(
        variables, images[:64], calibrating=True, mutable=["quant"])
    quant = mut["quant"]
    converted = convert_params(variables["params"], QFormat.PyTorchINT8)
    model_c = ViT(q_format=QFormat.PyTorchINT8, converted=True, **kw)

    results = {}

    def record(name, fn, *x):
        if args.only and args.only not in name:
            return
        results[name] = slope(fn, x, args.iters)
        print(f"{name:10s} {results[name]:9.3f} ms/iter", flush=True)

    def full_loop(length):
        @jax.jit
        def loop(params, quant, images):
            def body(carry, _):
                out = model_c.apply(
                    {"params": params, "quant": quant},
                    images + carry * 0, deterministic=True)
                return jnp.mean(out), None
            final, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=length)
            return final
        return loop

    record("full", full_loop, converted, quant, images)

    # ---- single fused int8 blocks at the model's exact shapes ----
    from myrtle_vision_tpu.ops.fused_int8_block import (
        int8_attention_block,
        int8_mlp_block,
    )

    C, H, hidden, N = 384, 6, 1536, 197
    ks = jax.random.split(rng, 8)
    xb = jax.random.normal(ks[0], (B, N, C), jnp.float32)
    sl = jnp.ones((C,), jnp.float32)
    bl = jnp.zeros((C,), jnp.float32)
    wq = jax.random.randint(ks[1], (C, 3 * C), -128, 128, jnp.int8)
    wo = jax.random.randint(ks[2], (C, C), -128, 128, jnp.int8)
    w1 = jax.random.randint(ks[3], (C, hidden), -128, 128, jnp.int8)
    w2 = jax.random.randint(ks[4], (hidden, C), -128, 128, jnp.int8)
    bq = jnp.zeros((3 * C,), jnp.float32)
    bo = jnp.zeros((C,), jnp.float32)
    b1 = jnp.zeros((hidden,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    wsc = jnp.float32(0.01)
    site = (jnp.float32(0.05), jnp.float32(128.0), jnp.float32(1.0))
    sites5 = [site] * 5

    def attn(x):
        return int8_attention_block(
            x, sl, bl, wq, wsc, bq, wo, wsc, bo, sites5,
            heads=H, scale=(C // H) ** -0.5)

    def mlp(x):
        return int8_mlp_block(x, sl, bl, w1, wsc, b1, w2, wsc, b2, sites5)

    def block_loop(fn):
        def make(length):
            @jax.jit
            def loop(x):
                def body(carry, _):
                    return fn(carry) * 0.5, None
                out, _ = jax.lax.scan(body, x, None, length=length)
                return jnp.sum(out[0, 0, :8].astype(jnp.float32))
            return loop
        return make

    record("attn_i8", block_loop(attn), xb)
    record("mlp_i8", block_loop(mlp), xb)

    # ---- the fp32 3-pass softmax core ALONE (XLA, same shapes) ----
    from myrtle_vision_tpu.ops.high_precision import dot_high3

    q = jax.random.normal(ks[5], (B, H, N, C // H), jnp.float32)
    k = jax.random.normal(ks[6], (B, H, N, C // H), jnp.float32)
    v = jax.random.normal(ks[7], (B, H, N, C // H), jnp.float32)

    def core(q, k, v):
        s = dot_high3(q * (C // H) ** -0.5, k,
                      (((3,), (3,)), ((0, 1), (0, 1))))
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        return dot_high3(p, v, (((3,), (2,)), ((0, 1), (0, 1))))

    def core_loop(length):
        @jax.jit
        def loop(q, k, v):
            def body(carry, _):
                out = core(q + carry * 0, k, v)
                return jnp.mean(out), None
            final, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=length)
            return final
        return loop

    record("core_fp32", core_loop, q, k, v)

    # ---- bf16 fused blocks: the nothing-quantized floor ----
    from myrtle_vision_tpu.ops.fused_attention_block import (
        fused_attention_block,
    )
    from myrtle_vision_tpu.ops.fused_mlp import fused_mlp_block

    dt = jnp.bfloat16
    xbf = xb.astype(dt)
    wqf = (wq.astype(jnp.float32) * 0.01).astype(dt)
    wof = (wo.astype(jnp.float32) * 0.01).astype(dt)
    w1f = (w1.astype(jnp.float32) * 0.01).astype(dt)
    w2f = (w2.astype(jnp.float32) * 0.01).astype(dt)

    def attn_bf(x):
        return fused_attention_block(
            x, sl.astype(dt), bl, wqf, bq, wof, bo, H, (C // H) ** -0.5,
            None, 1.0, 12)

    def mlp_bf(x):
        return fused_mlp_block(x, sl.astype(dt), bl, w1f, b1, w2f, b2)

    record("bf16_attn", block_loop(attn_bf), xbf)
    record("bf16_mlp", block_loop(mlp_bf), xbf)

    if all(k in results for k in ("full", "attn_i8", "mlp_i8")):
        blocks = 12 * (results["attn_i8"] + results["mlp_i8"])
        print(f"\n--- attribution (ms @ b{B}) ---")
        print(f"full converted       {results['full']:9.3f}"
              f"   ({B / results['full'] * 1e3:.0f} img/s)")
        print(f"  12x int8 blocks    {blocks:9.3f}")
        print(f"  edges (full-blk)   {results['full'] - blocks:9.3f}"
              "   <- patch-embed/pos/cls/head + their requants")
        if "core_fp32" in results:
            print(f"  12x fp32 core (ub) {12 * results['core_fp32']:9.3f}"
                  "   <- standalone upper bound incl. HBM io")
        if "bf16_attn" in results:
            bffloor = 12 * (results["bf16_attn"] + results["bf16_mlp"])
            print(f"  12x bf16 blocks    {bffloor:9.3f}"
                  "   <- nothing-quantized floor")


if __name__ == "__main__":
    main()
