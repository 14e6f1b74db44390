#!/usr/bin/env python
"""Measure Mosaic layout costs of the backward-pass contraction forms.

The fused block backwards are full of "transposed" dot_generals —
contractions over dim 0 of an activation (dv = e^T @ du, dk = ds^T @ q,
dw = x^T @ dy) and over dim 1 of a weight (dxn = dy @ W^T).  The round-2
forward rework showed Mosaic's implicit relayouts are expensive; this
probe times each backward contraction in (a) its current implicit form
and (b) candidate explicit-layout forms, inside a Pallas kernel shaped
like the real ones (grid over image groups, unrolled heads), so round-4
picks layouts from measurements.

Run on the chip: python tools/perf/layout_probe.py [--batch 512]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _dot(a, b, contract):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
    )


def run_case(name, body, b, g, inputs, iters):
    """Time `body` over `g` unrolled images per grid step.

    inputs: list of (shape, dtype, batched).  body receives, per image,
    the per-image slice of batched inputs and the whole array otherwise.
    The first batched input is the scan carry (real data dependence so
    the kernel cannot be hoisted out of the timing loop).
    """
    def kernel(*refs):
        in_refs, o_ref = refs[:-1], refs[-1]
        for j in range(g):
            vals = [
                r[j] if batched else r[...]
                for r, (_, _, batched) in zip(in_refs, inputs)
            ]
            o_ref[j] = body(vals)

    rng = jax.random.PRNGKey(0)
    xs = []
    for shp, dt, batched in inputs:
        rng, k = jax.random.split(rng)
        full = ((b,) + shp) if batched else shp
        xs.append(jax.random.normal(k, full, dt) * 0.1)
    probe_out = body([
        x[0] if batched else x
        for x, (_, _, batched) in zip(xs, inputs)
    ])
    out_shape = jax.ShapeDtypeStruct((b,) + probe_out.shape,
                                     probe_out.dtype)

    def spec(shp, batched):
        if batched:
            return pl.BlockSpec((g,) + shp,
                                lambda i: (i,) + (0,) * len(shp),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                            memory_space=pltpu.VMEM)

    specs = [spec(shp, batched) for shp, _, batched in inputs]
    out_spec = pl.BlockSpec(
        (g,) + probe_out.shape,
        lambda i: (i,) + (0,) * probe_out.ndim,
        memory_space=pltpu.VMEM)

    fn = pl.pallas_call(
        kernel, grid=(b // g,), in_specs=specs, out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )

    carry_idx = next(i for i, (_, _, bt) in enumerate(inputs) if bt)
    carry_shape = xs[carry_idx].shape

    def feedback(out, c):
        # slice-then-pad the kernel output into the carry's shape —
        # a cheap elementwise dependence XLA cannot fold away
        sl = tuple(slice(0, min(o, s))
                   for o, s in zip(out.shape, c.shape))
        piece = out[sl].astype(c.dtype)
        pad = [(0, s - min(o, s))
               for o, s in zip(out.shape, c.shape)]
        return c * 0.5 + jnp.pad(piece, pad) * 1e-3

    def make_loop(length):
        @jax.jit
        def loop(*xs):
            def step(c, _):
                args = list(xs)
                args[carry_idx] = c
                out = fn(*args)
                return feedback(out, c), None
            c, _ = jax.lax.scan(step, xs[carry_idx], None,
                                length=length)
            return jnp.sum(c[(0,) * (c.ndim - 1)][:8].astype(
                jnp.float32))
        return loop

    # NOTE: on this container's axon client block_until_ready() does NOT
    # synchronize — only a host fetch does.  Time two scan lengths and
    # take the slope, which cancels ALL fixed overhead (dispatch RTT,
    # fetch, compile-cache lookups).
    lo, hi = iters, iters * 5
    try:
        loop_lo, loop_hi = make_loop(lo), make_loop(hi)
        float(loop_lo(*xs))  # compile + warm
        float(loop_hi(*xs))
        t0 = time.perf_counter()
        float(loop_lo(*xs))
        t1 = time.perf_counter()
        float(loop_hi(*xs))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        print(f"{name:34s} {dt*1e3:8.3f} ms/iter", flush=True)
    except Exception as e:
        msg = (str(e).splitlines() or ["?"])[0][:90]
        print(f"{name:34s} FAILED: {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--seq", type=int, default=197)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    B, G, N, C, H = (args.batch, args.group, args.seq, args.dim,
                     args.heads)
    D = C // H
    bf = jnp.bfloat16
    it = args.iters
    print(f"B={B} g={G} N={N} C={C} H={H} D={D}", flush=True)

    def heads_body(fn):
        def body(xs):
            return jnp.concatenate(
                [fn(xs, h) for h in range(H)], axis=-1)
        return body

    estk = ((N, H * N), bf, True)   # per-head (N, N) stack
    dstk = ((N, C), bf, True)       # per-head (N, D) stack

    # ---- per-head score-space dots (unrolled over H heads) ----
    run_case(
        "dv  e^T@du   implicit (0,0)",
        heads_body(lambda xs, h: _dot(
            xs[0][:, h * N:(h + 1) * N], xs[1][:, h * D:(h + 1) * D],
            ((0,), (0,)))),
        B, G, [estk, dstk], it)

    run_case(
        "dv  (e.T)@du explicit T",
        heads_body(lambda xs, h: _dot(
            xs[0][:, h * N:(h + 1) * N].T, xs[1][:, h * D:(h + 1) * D],
            ((1,), (0,)))),
        B, G, [estk, dstk], it)

    run_case(
        "dp  du@v^T   implicit (1,1)",
        heads_body(lambda xs, h: _dot(
            xs[0][:, h * D:(h + 1) * D], xs[1][:, h * D:(h + 1) * D],
            ((1,), (1,)))),
        B, G, [dstk, dstk], it)

    run_case(
        "dp  du@(v.T) explicit T",
        heads_body(lambda xs, h: _dot(
            xs[0][:, h * D:(h + 1) * D],
            xs[1][:, h * D:(h + 1) * D].T,
            ((1,), (0,)))),
        B, G, [dstk, dstk], it)

    run_case(
        "s   q@k^T    implicit (1,1) REF",
        heads_body(lambda xs, h: _dot(
            xs[0][:, h * D:(h + 1) * D], xs[1][:, h * D:(h + 1) * D],
            ((1,), (1,)))),
        B, G, [dstk, dstk], it)

    # ---- full-width projection-space dots (one per image) ----
    C3 = 3 * C

    run_case(
        "dw  xn^T@dqkv implicit (0,0)",
        lambda xs: _dot(xs[0], xs[1], ((0,), (0,))),
        B, G, [((N, C), bf, True), ((N, C3), bf, True)], it)

    run_case(
        "dw  (xn.T)@dqkv explicit T",
        lambda xs: _dot(xs[0].T, xs[1], ((1,), (0,))),
        B, G, [((N, C), bf, True), ((N, C3), bf, True)], it)

    run_case(
        "dxn dqkv@w^T implicit (1,1)",
        lambda xs: _dot(xs[0], xs[1], ((1,), (1,))),
        B, G, [((N, C3), bf, True), ((C, C3), bf, False)], it)

    run_case(
        "dxn dqkv@wT  pre-transposed",
        lambda xs: _dot(xs[0], xs[1], ((1,), (0,))),
        B, G, [((N, C3), bf, True), ((C3, C), bf, False)], it)

    run_case(
        "qkv xn@w     natural REF",
        lambda xs: _dot(xs[0], xs[1], ((1,), (0,))),
        B, G, [((N, C), bf, True), ((C, C3), bf, False)], it)


if __name__ == "__main__":
    main()
