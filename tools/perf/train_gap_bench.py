#!/usr/bin/env python
"""Attribute the ViT-S/16 train-vs-infer MFU gap, component by component
(VERDICT r4 item 6: 59.2% infer vs 51.0% train @ b512 — with the qkv
rows saved, executed backward MACs ~3.19x forward predict ~55%; find or
bound the missing ~4 points).

Measures, on the real chip with the slope method (two scan lengths —
block_until_ready does not synchronize on this container's axon client):

  infer        full-model forward                       (bench.py parity)
  grad         value_and_grad only (no optimizer)
  train        grad + AdamW update                      (bench.py parity)
  opt          AdamW update alone on the ViT-S tree
  attn_fb      one fused attention block fwd+bwd (auto group)
  mlp_fb       one fused MLP block fwd+bwd
  attn_f       one fused attention block fwd
  mlp_f        one fused MLP block fwd
  embed_train  depth-0 model (patchify+embed+pos+head) grad+opt

Run: python tools/perf/train_gap_bench.py [--batch 512] [--iters 30]
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
    """ms/iter via the two-length slope method."""
    lo, hi = iters, iters * 3
    loop_lo, loop_hi = loop_fn(lo), loop_fn(hi)
    float(loop_lo(*x))  # compile + warm
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    B = args.batch

    import optax

    from myrtle_vision_tpu.models.vit import ViT
    from myrtle_vision_tpu.quantize import QFormat
    from myrtle_vision_tpu.training.classification import make_loss_fn
    from myrtle_vision_tpu.training.optim import create_optimizer
    from myrtle_vision_tpu.training.trainer import init_train_state

    train_config = {
        "optimizer": "adamw", "opt_eps": 1e-8, "opt_betas": None,
        "clip_grad": None, "momentum": 0.9, "weight_decay": 0.05,
        "lr": 1e-4,
    }

    def build(depth):
        model = ViT(
            decoder="classification", image_size=224, patch_size=16,
            num_classes=45, dim=384, depth=depth, heads=6, mlp_dim=1536,
            q_format=QFormat.FP32,
        )
        tx = create_optimizer(train_config)
        state = init_train_state(
            model, tx, jax.random.PRNGKey(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32),
        )
        return model, tx, state

    model, tx, state = build(12)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, 224, 224, 3), jnp.float32)
    labels = jnp.zeros((B,), jnp.int32)
    loss_fn = make_loss_fn(model)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    results = {}

    def record(name, fn, *x):
        if args.only and args.only not in name:
            return
        results[name] = slope(fn, x, args.iters)
        print(f"{name:12s} {results[name]:9.3f} ms/iter", flush=True)

    # ---- infer ----
    def infer_loop(length):
        @jax.jit
        def loop(params, images):
            def body(carry, _):
                out = model.apply(
                    {"params": params}, images + carry * 0,
                    deterministic=True,
                )
                return jnp.mean(out), None
            final, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=length)
            return final
        return loop

    record("infer", infer_loop, state.params, images)

    # ---- grad only ----
    def grad_loop(length):
        @jax.jit
        def loop(params, images, labels, rng):
            def body(carry, i):
                p, acc = carry
                (loss, _), grads = grad_fn(
                    p, {}, {"image": images, "label": labels},
                    jax.random.fold_in(rng, i),
                )
                # fold the grads back so the scan carries a real
                # dependence without an optimizer
                p = jax.tree_util.tree_map(
                    lambda a, g: a - 0.0 * g.astype(a.dtype), p, grads
                )
                return (p, acc + loss), None
            (p, acc), _ = jax.lax.scan(
                body, (params, jnp.float32(0)), jnp.arange(length))
            return acc
        return loop

    record("grad", grad_loop, state.params, images, labels, rng)

    # ---- full train step (bench.py parity) ----
    def train_loop(length):
        @jax.jit
        def loop(state, images, labels, rng):
            def body(st, i):
                (loss, _), grads = grad_fn(
                    st.params, st.quant,
                    {"image": images, "label": labels},
                    jax.random.fold_in(rng, i),
                )
                updates, opt_state = tx.update(
                    grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return st.replace(params=params, opt_state=opt_state), loss
            st, losses = jax.lax.scan(body, state, jnp.arange(length))
            return losses[-1]
        return loop

    record("train", train_loop, state, images, labels, rng)

    # ---- optimizer update alone ----
    fixed_grads = jax.tree_util.tree_map(
        lambda p: jnp.ones_like(p) * 1e-6, state.params)

    def opt_loop(length):
        @jax.jit
        def loop(state, grads):
            def body(st, _):
                updates, opt_state = tx.update(
                    grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return st.replace(params=params, opt_state=opt_state), None
            st, _ = jax.lax.scan(body, state, None, length=length)
            return jnp.sum(
                jax.tree_util.tree_leaves(st.params)[0][..., :2]
                .astype(jnp.float32))
        return loop

    record("opt", opt_loop, state, fixed_grads)

    # ---- single fused blocks (auto groups, same policy as the model) --
    from myrtle_vision_tpu.ops.fused_attention_block import (
        fused_attention_block,
    )
    from myrtle_vision_tpu.ops.fused_mlp import fused_mlp_block

    C, H, hidden = 384, 6, 1536
    ks = jax.random.split(rng, 8)
    dt = jnp.bfloat16
    xb = jax.random.normal(ks[0], (B, 197, C), dt)
    sl = jnp.ones((C,), dt)
    bl = jnp.zeros((C,), dt)
    wqkv = jax.random.normal(ks[1], (C, 3 * C), dt) * 0.05
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wp = jax.random.normal(ks[2], (C, C), dt) * 0.05
    bp = jnp.zeros((C,), jnp.float32)
    w1 = jax.random.normal(ks[3], (C, hidden), dt) * 0.05
    b1 = jnp.zeros((hidden,), jnp.float32)
    w2 = jax.random.normal(ks[4], (hidden, C), dt) * 0.05
    b2 = jnp.zeros((C,), jnp.float32)

    def attn(x):
        return fused_attention_block(
            x, sl, bl, wqkv, bqkv, wp, bp, H, (C // H) ** -0.5,
            None, 1.0, 12)

    def mlp(x):
        return fused_mlp_block(x, sl, bl, w1, b1, w2, b2)

    def block_loop(fn, grad):
        if grad:
            gf = jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32)))

            def step(x):
                return (x - 0.001 * gf(x).astype(x.dtype)) * 0.5
        else:
            def step(x):
                return fn(x) * 0.5

        def make(length):
            @jax.jit
            def loop(x):
                def body(carry, _):
                    return step(carry), None
                out, _ = jax.lax.scan(body, x, None, length=length)
                return jnp.sum(out[0, 0, :8].astype(jnp.float32))
            return loop
        return make

    record("attn_f", block_loop(attn, False), xb)
    record("attn_fb", block_loop(attn, True), xb)
    record("mlp_f", block_loop(mlp, False), xb)
    record("mlp_fb", block_loop(mlp, True), xb)

    # ---- depth-0 model: embed + pos + head + loss + opt ----
    model0, tx0, state0 = build(0)
    loss0 = make_loss_fn(model0)
    grad0 = jax.value_and_grad(loss0, has_aux=True)

    def d0_loop(length):
        @jax.jit
        def loop(state, images, labels, rng):
            def body(st, i):
                (loss, _), grads = grad0(
                    st.params, st.quant,
                    {"image": images, "label": labels},
                    jax.random.fold_in(rng, i),
                )
                updates, opt_state = tx0.update(
                    grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return st.replace(params=params, opt_state=opt_state), loss
            st, losses = jax.lax.scan(body, state, jnp.arange(length))
            return losses[-1]
        return loop

    record("embed_train", d0_loop, state0, images, labels, rng)

    # ---- summary ----
    if all(k in results for k in
           ("train", "grad", "opt", "attn_fb", "mlp_fb", "infer")):
        blocks_fb = 12 * (results["attn_fb"] + results["mlp_fb"])
        blocks_f = 12 * (results.get("attn_f", 0) + results.get("mlp_f", 0))
        print("\n--- attribution (ms @ b%d) ---" % B)
        print(f"train total          {results['train']:9.3f}")
        print(f"  grad               {results['grad']:9.3f}")
        print(f"  opt (train-grad)   {results['train']-results['grad']:9.3f}"
              f"   (opt alone: {results['opt']:.3f})")
        print(f"  12x fused blocks   {blocks_fb:9.3f}")
        print(f"  grad - blocks      {results['grad']-blocks_fb:9.3f}"
              "   <- embed/head/loss/residual-IO/scan")
        if "embed_train" in results:
            print(f"  depth0 train       {results['embed_train']:9.3f}")
        print(f"infer total          {results['infer']:9.3f}")
        print(f"  12x fused blocks f {blocks_f:9.3f}")
        print(f"  infer - blocks     {results['infer']-blocks_f:9.3f}")


if __name__ == "__main__":
    main()
