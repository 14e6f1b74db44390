"""Fused transformer attention block:
x + proj(attention(qkv(layernorm(x)))).

One Pallas program per (group of) batch image(s); everything between the
HBM read of x and the HBM write of the residual output stays in VMEM.
This removes the (3,b,h,n,d) permute (~1ms/layer of HBM copies at batch
256) and the per-layer pad/slice of the standalone flash kernel.

Row-major layout (second generation — measured 21% faster than the
original head-major (3,H,D,N) form at ViT-S/16 batch 512):

  xn   = LN(x)                                   (N, C)
  qkv  = xn @ W + b    — ONE full-tile dot       (N, 3C)
  per head h (Python-unrolled, 64-wide lane slices):
    s    = (q_h * scale) @ k_h^T                 (N, N)
    e    = exp(s - rowmax(s))
    o_h  = (e @ v_h) * recip(rowsum(e))          (N, D)
  o    = concat_h(o_h)                           (N, C)
  out  = x + o @ Wp + bp

Why this layout wins on the MXU:
  - the QKV projection runs as (N,C)@(C,3C): 200x384x1152 padded
    MAC-slots vs 1152x384x256 for the head-major form (-22%);
  - the output projection is ONE (N,C)@(C,C) full-util dot instead of
    six half-tile per-head dots plus an (H,N,C) reduction (-50%);
  - the softmax division is deferred past the PV dot: an (N,D) scale
    replaces an (N,N) divide (and the divide itself is a Newton-refined
    fast reciprocal — the true divide runs on the slow transcendental
    unit);
  - unrolled per-head score/softmax/PV interleaves VPU and MXU work.
  The score/PV dots keep the D=64 half-tile contraction — packing head
  pairs into block-diagonal 128-wide operands has identical MAC-slot
  cost and only saves pipeline fills; measured net-neutral.

Backward: when HBM affords it (ops/acts_policy.py) the forward SAVES
the fused qkv rows and the backward skips the QKV-projection recompute
— bit-identical to the rematerialized value (same dot, same cast), and
at ViT-S/16 that dot was ~60% of the attention backward's extra MACs
(the train-vs-infer MFU gap, BENCH_r03).  Otherwise the backward
recomputes the projection per program (rematerialization).  Either way
it accumulates weight/bias/norm grads in fp32 VMEM outputs across the
sequential grid.  Weight grads are produced directly in the parameter
layouts ((C,3C), (C,C)).  Used by the FP32 fast path of the transformer
Block (models/vit.py).

Stateless quantization formats (FP16_16 / FP16_32 / TF32) run the SAME
kernels with ``qspec=(exp_bits, man_bits, all_sites)``: the float-format
snap (ops/fake_quant.py float_quantize) is applied IN-KERNEL at exactly
the discrete-site positions of the unfused path (models/vit.py QDense/
QLayerNorm ActQuant sites — pre_linear always; post_op/functional when
``all_sites``, i.e. FP16_16), activations stay fp32, all dots run
with 3-pass bf16 decomposition dots (HIGH-grade; Mosaic
implements) with post-dot core
scaling and exact-divide softmax — matching the unfused quant path
(ops/attention.py xla impl) op for op.  This removes the ~5x
discrete-site HBM round-trip penalty the QAT simulation paid (BASELINE
round-2 throughput table: 661 vs 3518 train img/s).  Gradients: the
sites are straight-through estimators, so the backward is the FP32
backward with the snapped forward intermediates recomputed at the same
positions.  PyTorchINT8 keeps the discrete-site implementation (its
observers are stateful).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myrtle_vision_tpu.ops.acts_policy import save_acts
from myrtle_vision_tpu.ops.fake_quant import (
    float_quantize,
    snap as _snap,
    snap_all as _snap_all,
    snap_int8 as _snap_int8,
)
from myrtle_vision_tpu.ops.high_precision import dot_high3

_EPS = 1e-5


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _ln_f32(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jax.lax.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _recip_f32(y):
    """Fast reciprocal + one Newton step (~2^-24 relative, i.e. fp32
    roundoff); interpret mode keeps the exact divide for bit-stable CPU
    tests."""
    if _interpret():
        return 1.0 / y
    r = pl.reciprocal(y, approx=True)
    return r * (2.0 - y * r)


def _dot(a, b, contract, prefer=jnp.float32, precision=None):
    # JAX_DEFAULT_MATMUL_PRECISION=highest would otherwise leak fp32
    # contract precision onto bf16 operands, which Mosaic rejects (and
    # which is a no-op anyway: bf16 products are exact in fp32).
    if precision is None and a.dtype != jnp.float32:
        precision = jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=prefer, precision=precision,
    )


def _dotq(a, b, contract, qspec):
    """Quant-format dot: 3-pass bf16 decomposition (HIGH-grade; see
    ops/high_precision.py — Mosaic has no native HIGH and HIGHEST's 6
    passes measured 691 img/s train) when qspec is set, DEFAULT
    otherwise."""
    if qspec is not None:
        return dot_high3(a, b, (contract, ((), ())))
    return _dot(a, b, contract)


def _qkv_rows(x, scale_ln, bias_ln, w_ref, bq_ref, qspec=None,
              qs_ref=None):
    """LN + fused QKV projection: (N, C) -> (N, 3C) in x.dtype.

    Quant sites (qspec not None): attn_norm.act_in (pre_linear snap of
    x), attn_norm.act_out (post_op, all-sites only), to_qkv.act_in
    (pre_linear), to_qkv.act_out (post_op, all-sites only); the
    projection dot runs the 3-pass HIGH-grade decomposition like the
    discrete QDense (ops/high_precision.py).  ``qspec == "int8"``
    (two-pass INT8 QAT, models/vit.py Block) instead applies the
    affine uint8 site snaps with the frozen per-site qparams in
    ``qs_ref``: attn_norm.act_out -> row 0, to_qkv.act_out -> row 1."""
    ln_out, xhat, rstd = _ln_f32(_snap(x, qspec), scale_ln, bias_ln)
    ln_out = _snap(_snap_all(ln_out, qspec), qspec)
    ln_out = _snap_int8(ln_out, qspec, qs_ref, 0)
    xn = ln_out.astype(x.dtype)
    qkv = _dotq(
        xn, w_ref[...], ((1,), (0,)), qspec
    ) + bq_ref[...].astype(jnp.float32)
    qkv = _snap_all(qkv, qspec)
    qkv = _snap_int8(qkv, qspec, qs_ref, 1)
    return qkv.astype(x.dtype), xn, xhat, rstd


def _attn_heads_fwd(qkv, heads, scale, dtype, qspec=None):
    """Per-head score/softmax/PV -> ((N, C) context, (H, N) rowmax,
    (H, N) reciprocal-rowsum).

    Quant path: matches the unfused fp32 core (ops/attention.py xla
    impl) op for op — 3-pass HIGH-grade dots, post-dot scaling, exact-divide
    softmax (the reference dequantizes around the core, vit.py:78-97)."""
    c = qkv.shape[-1] // 3
    d = c // heads
    outs, ms, rss = [], [], []
    for h in range(heads):
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        if qspec is not None:
            s = _dotq(q, k, ((1,), (1,)), qspec) \
                * jnp.float32(scale)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            ssum = jnp.sum(e, axis=-1, keepdims=True)
            # true division, NOT multiply-by-reciprocal: bit-parity with
            # the unfused jax.nn.softmax core
            p = e / ssum
            u = _dotq(p, v, ((1,), (0,)), qspec)
            rs = 1.0 / ssum  # backward-only statistic
            outs.append(u.astype(dtype))
        else:
            qs = (q.astype(jnp.float32) * scale).astype(dtype)
            s = _dot(qs, k, ((1,), (1,)))  # (N, N) fp32
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            u = _dot(e.astype(dtype), v, ((1,), (0,)))  # (N, D) fp32
            rs = _recip_f32(jnp.sum(e, axis=-1, keepdims=True))
            outs.append((u * rs).astype(dtype))
        ms.append(m[:, 0])
        rss.append(rs[:, 0])
    return (
        jnp.concatenate(outs, axis=-1),  # (N, C)
        jnp.stack(ms),                   # (H, N)
        jnp.stack(rss),                  # (H, N)
    )


def _fwd_kernel(x_ref, s_ref, b_ref, w_ref, bq_ref, wp_ref, bp_ref,
                *others, scale, heads, group, save_stats, qspec,
                res_scale=1.0, save_qkv=False):
    """Forward; with ``save_stats`` also writes the softmax statistics
    and the pre-projection context as residuals for the backward
    (rest = (ctx_ref, m_ref, rs_ref)), skipping their recomputation
    there (the backward then needs no max/sum reductions and no
    u-recompute dots).  With ``save_qkv`` additionally writes the fused
    qkv rows (rest += (qkv_ref,)) so the backward skips the
    QKV-projection recompute too (module docstring).  ``qspec ==
    "int8"`` threads one extra input ref (the (5, 3) SMEM site-qparams
    block) ahead of the outputs."""
    if qspec == "int8":
        qs_ref, o_ref, rest = others[0], others[1], others[2:]
    else:
        qs_ref, o_ref, rest = None, others[0], others[1:]
    scale_ln = s_ref[...].astype(jnp.float32)
    bias_ln = b_ref[...].astype(jnp.float32)
    for j in range(group):
        x = x_ref[j]  # (N, C)
        qkv, _, _, _ = _qkv_rows(
            x, scale_ln, bias_ln, w_ref, bq_ref, qspec, qs_ref
        )
        o, m, rs = _attn_heads_fwd(qkv, heads, scale, x.dtype, qspec)
        # to_out.act_in (pre_linear) snaps the attention context; the
        # saved residual must be the snapped value (it is the actual
        # input of the output projection, so dWp contracts against it).
        # INT8: the quant_out stub (site 2) sits at the same position.
        o = _snap(o.astype(jnp.float32), qspec)
        o = _snap_int8(o, qspec, qs_ref, 2).astype(x.dtype)
        y = _dotq(
            o, wp_ref[...], ((1,), (0,)), qspec
        ) + bp_ref[...].astype(jnp.float32)
        y = _snap_all(y, qspec)  # to_out.act_out (post_op)
        y = _snap_int8(y, qspec, qs_ref, 3)
        out = x.astype(jnp.float32) * res_scale + y
        out = _snap_all(out, qspec)  # attn_res (functional)
        out = _snap_int8(out, qspec, qs_ref, 4)
        o_ref[j] = out.astype(o_ref.dtype)
        if save_stats:
            ctx_ref, m_ref, rs_ref = rest[:3]
            ctx_ref[j] = o
            m_ref[j] = m
            rs_ref[j] = rs
            if save_qkv:
                rest[3][j] = qkv.astype(rest[3].dtype)


def _fwd_group(b: int, c: int) -> int:
    """Images per forward grid step (MVT_ATTN_FWD_GROUP overrides).

    Default 8: measured on v5e at ViT-S/16 batch 512 — infer img/s
    9439 (g=1) / 9583 (g=4) / 9808 (g=8) / 9317 (g=16); train follows
    the same shape.  The forward holds no accumulators so larger groups
    are cheap until block size crowds the pipeline (g=16).

    dim<256 (ViT-Tiny) prefers 16: half the per-image VMEM stack makes
    the larger group legal and the small matmul tiles need more rows in
    flight — v5e Tiny-shape sweep (B=512): g=16 1.05-1.09 ms vs g=8
    1.15 ms per block fwd (the g=32 sweep point VMEM-caps to 16)."""
    import os

    env = os.environ.get("MVT_ATTN_FWD_GROUP")
    if env:
        g = int(env)
        return g if b % g == 0 else 1
    prefs = (16, 8, 4, 2) if c < 256 else (8, 4, 2)
    for g in prefs:
        if b % g == 0:
            return g
    return 1


def _per_image_stack_bytes(n: int, heads: int, d: int) -> int:
    """Rough per-image VMEM stack estimate for one unrolled kernel
    iteration: ~3 fp32 copies of the (N, N) score/prob tensors per head
    plus the fp32 qkv intermediates (Mosaic does not reuse stack across
    unrolled iterations)."""
    return 3 * heads * n * n * 4 + 2 * 3 * heads * d * n * 4


def fuses_at(n: int, heads: int, d: int) -> bool:
    """Whether the fused block kernels can hold one image's attention
    working set under the per-kernel VMEM ceiling; longer sequences
    (e.g. detection eval at 800px -> ~2600 tokens) take the unfused
    path, which routes to the flash-attention kernels."""
    return _per_image_stack_bytes(n, heads, d) <= 40 * 1024 * 1024


def _cap_group(g: int, b: int, n: int, heads: int, d: int) -> int:
    """Shrink the image group so the unrolled loop's total live stack
    stays under the VMEM ceiling (long sequences force smaller groups)."""
    per_image = _per_image_stack_bytes(n, heads, d)
    while g > 1 and (g * per_image > 40 * 1024 * 1024 or b % g):
        g //= 2
    return max(g, 1)


def _attn_forward(x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale,
                  save_stats=False, qspec=None, res_scale=1.0,
                  save_qkv=False, qs=None):
    b, n, c = x.shape
    # under head-sharded tensor parallelism wqkv/wp are the LOCAL head
    # slices: wqkv (c, 3*cl), wp (cl, c) with cl = local_heads * d —
    # derive attention widths from the weights, not from x
    cl = wp.shape[0]
    d = cl // heads
    g = _cap_group(_fwd_group(b, c), b, n, heads, d)

    row = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    out_specs = row
    out_shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
    if save_stats:
        ctx_row = pl.BlockSpec((g, n, cl), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        hn = pl.BlockSpec((g, heads, n), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
        out_specs = [row, ctx_row, hn, hn]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((b, n, cl), x.dtype),         # context o
            jax.ShapeDtypeStruct((b, heads, n), jnp.float32),  # rowmax
            jax.ShapeDtypeStruct((b, heads, n), jnp.float32),  # 1/rowsum
        ]
        if save_qkv:
            out_specs.append(
                pl.BlockSpec((g, n, 3 * cl), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(
                jax.ShapeDtypeStruct((b, n, 3 * cl), x.dtype)
            )
        out_specs, out_shape = tuple(out_specs), tuple(out_shape)
    in_specs = [
        row,
        vec_c,
        vec_c,
        pl.BlockSpec((c, 3 * cl), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * cl,), lambda i: (0,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cl, c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        vec_c,
    ]
    extra_in = ()
    if qspec == "int8":
        in_specs.append(
            pl.BlockSpec(qs.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        extra_in = (qs.astype(jnp.float32),)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, heads=heads, group=g,
            save_stats=save_stats, qspec=qspec, res_scale=res_scale,
            save_qkv=save_qkv,
        ),
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x, scale_ln.astype(x.dtype), bias_ln.astype(x.dtype),
      wqkv.astype(x.dtype), bqkv.astype(jnp.float32),
      wp.astype(x.dtype), bp.astype(x.dtype), *extra_in)
    return out


def _bwd_kernel(x_ref, s_ref, b_ref, w_ref, bq_ref, wp_ref,
                do_ref, ctx_ref, m_ref, rs_ref, *rest, scale, heads,
                group, qspec, res_scale=1.0, save_qkv=False):
    """Backward for a GROUP of images per grid step.

    Weight/bias/norm grads for the whole group are summed into local
    values first and hit the fp32 VMEM accumulator outputs ONCE per grid
    step — grouping divides the ~2.4MB accumulator read-modify-write
    traffic (and the grid/pipeline overhead) by ``group``."""
    if save_qkv:
        qkv_ref = rest[0]
        rest = rest[1:]
    if qspec == "int8":
        qs_ref = rest[0]
        rest = rest[1:]
    else:
        qs_ref = None
    (dx_ref, ds_ref, db_ref, dw_ref, dbq_ref, dwp_ref, dbp_ref) = rest
    i = pl.program_id(0)
    scale_ln = s_ref[...].astype(jnp.float32)
    bias_ln = b_ref[...].astype(jnp.float32)

    acc = None
    for j in range(group):
        grads = _bwd_one_image(
            x_ref[j], do_ref[j].astype(jnp.float32), scale_ln, bias_ln,
            w_ref, bq_ref, wp_ref, dx_ref, j,
            ctx_ref[j], m_ref[j], rs_ref[j],
            qkv_ref[j] if save_qkv else None,
            scale=scale, heads=heads, qspec=qspec,
            res_scale=res_scale, qs_ref=qs_ref,
        )
        acc = grads if acc is None else tuple(
            a + g for a, g in zip(acc, grads)
        )
    dscale, dbias, dw, dbq, dwp, dbp = acc

    @pl.when(i == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    ds_ref[...] += dscale
    db_ref[...] += dbias
    dw_ref[...] += dw
    dbq_ref[...] += dbq
    dwp_ref[...] += dwp
    dbp_ref[...] += dbp


def _bwd_one_image(x, do, scale_ln, bias_ln, w_ref, bq_ref, wp_ref,
                   dx_ref, j, o, m_all, rs_all, qkv_saved=None, *,
                   scale, heads, qspec=None, res_scale=1.0, qs_ref=None):
    """Backward for one image.  ``o`` (N, C), ``m_all``/``rs_all``
    (H, N) are forward residuals: the pre-projection context and the
    softmax rowmax / reciprocal-rowsum, so the backward recomputes only
    the QKV projection and the score dots (no reductions, no PV dots).
    With ``qkv_saved`` (N, 3C) — the forward's own qkv rows, saved when
    HBM affords it (ops/acts_policy.py) — even the projection recompute
    is skipped; only the LayerNorm (VPU) and score dots remain.

    Quant path: the sites are straight-through, so only the RECOMPUTED
    forward intermediates change (same snaps as the forward); dots keep
    the forward's precisions (3-pass dot_high3, like the forward)."""
    dtype = x.dtype
    if qkv_saved is not None:
        # LN-only recompute (the projection rows are the saved forward
        # values — bit-identical to what the remat would produce)
        ln_out, xhat, rstd = _ln_f32(
            _snap(x, qspec), scale_ln, bias_ln
        )
        ln_out = _snap(_snap_all(ln_out, qspec), qspec)
        ln_out = _snap_int8(ln_out, qspec, qs_ref, 0)
        xn = ln_out.astype(dtype)
        qkv = qkv_saved
    else:
        # ---- recompute forward (projection + scores only) ----
        qkv, xn, xhat, rstd = _qkv_rows(
            x, scale_ln, bias_ln, w_ref, bq_ref, qspec, qs_ref
        )
    # attention widths come from the (possibly head-sharded) qkv
    # projection, not from x (tensor parallelism: c_local < C)
    c = qkv.shape[-1] // 3
    d = c // heads
    dob = do.astype(dtype)

    # d_o (N, C) = do @ Wp^T
    d_o = _dotq(dob, wp_ref[...], ((1,), (1,)), qspec)

    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(heads):
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        m = m_all[h][:, None]   # (N, 1) stored rowmax
        rs = rs_all[h][:, None]  # (N, 1) stored 1/rowsum
        if qspec is not None:
            s = _dotq(q, k, ((1,), (1,)), qspec) \
                * jnp.float32(scale)
        else:
            qs = (q.astype(jnp.float32) * scale).astype(dtype)
            s = _dot(qs, k, ((1,), (1,)))  # (N, N) fp32
        e = jnp.exp(s - m)
        eb = e.astype(dtype)

        d_oh = d_o[:, h * d:(h + 1) * d]  # (N, D) fp32
        du = (d_oh * rs).astype(dtype)  # normalized head-output grad
        # dv (Nk, D) = p^T @ d_oh = e^T @ (d_oh * rs)
        dv_parts.append(_dotq(eb, du, ((0,), (0,)), qspec))
        # softmax backward in p-form without materializing p:
        # exact ds = p*(dp_raw - rowsum(dp_raw*p)) with p = e*rs and
        # dp_raw = d_oh @ v^T.  Using du = d_oh*rs gives dp = dp_raw*rs,
        # and rowsum(dp*e) = rowsum(dp_raw*p), so
        # ds = e*dp - p*rowsum(dp*e) = e * (dp - rs*rowsum(dp*e)).
        dp = _dotq(du, v, ((1,), (1,)), qspec)
        r_row = jnp.sum(dp * e, axis=-1, keepdims=True)
        dsm = e * (dp - r_row * rs)
        dsb = dsm.astype(dtype)
        # s = scale * (q @ k^T):  dq = scale*(ds @ k); dk = ds^T @ q*scale
        dq_parts.append(
            _dotq(dsb, k, ((1,), (0,)), qspec) * scale
        )
        if qspec is not None:
            dk_parts.append(
                _dotq(dsb, q, ((0,), (0,)), qspec) * scale
            )
        else:
            dk_parts.append(_dot(dsb, qs, ((0,), (0,))))

    dqkv = jnp.concatenate(
        dq_parts + dk_parts + dv_parts, axis=-1
    )  # (N, 3C) fp32
    dqkvb = dqkv.astype(dtype)

    # ---- projection weight grads ----
    dwp = _dotq(o, dob, ((0,), (0,)), qspec)  # (C, C)
    dbp = jnp.sum(do, axis=0)

    # ---- qkv projection backward ----
    dw = _dotq(xn, dqkvb, ((0,), (0,)), qspec)  # (C, 3C)
    dbq = jnp.sum(dqkv, axis=0)  # (3C,)
    dxn = _dotq(dqkvb, w_ref[...], ((1,), (1,)), qspec)

    # ---- LayerNorm backward ----
    dscale = jnp.sum(dxn * xhat, axis=0)
    dbias = jnp.sum(dxn, axis=0)
    dxhat = dxn * scale_ln
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)

    dx_ref[j] = (do * res_scale + dx_ln).astype(dx_ref.dtype)
    return dscale, dbias, dw, dbq, dwp, dbp


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_attention_block(x, scale_ln, bias_ln, wqkv, bqkv, wp, bp,
                          heads, scale, qspec=None, res_scale=1.0,
                          depth=None):
    """x*res_scale + proj(MHA(qkv(LN(x)))) over (B, N, C).

    wqkv: (C, 3C) fused projection (feature order [3][h][d], the timm/
    reference layout); wp: (C, C); heads/scale static.  ``qspec``:
    None (FP32) or the static ``(exp_bits, man_bits, all_sites)`` of a
    stateless quant format — weights must arrive already fake-quantized
    (the caller's STE handles their gradient).

    Head-sharded tensor parallelism: pass the LOCAL slices wqkv
    (C, 3*cl), bqkv (3*cl,), wp (cl, C) with heads = local head count,
    bp pre-scaled by 1/n_tp and ``res_scale = 1/n_tp``; a psum over the
    model axis of the partial outputs then reassembles
    x + proj + bias exactly (models/vit.py Block TP path).

    ``depth``: the model's real layer count, used only by the
    residual-saving HBM budget (ops/acts_policy.py); None falls back
    to the reference family's uniform 12.
    """
    return _attn_forward(
        x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale,
        qspec=qspec, res_scale=res_scale,
    )


def _fwd_rule(x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale,
              qspec, res_scale, depth):
    b, n, _ = x.shape
    cl = wp.shape[0]
    sv = save_acts(b * n * 3 * cl * jnp.dtype(x.dtype).itemsize, depth)
    outs = _attn_forward(
        x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale,
        save_stats=True, qspec=qspec, res_scale=res_scale, save_qkv=sv,
    )
    if sv:
        out, ctx, m, rs, qkv = outs
    else:
        (out, ctx, m, rs), qkv = outs, None
    return out, (x, scale_ln, bias_ln, wqkv, bqkv, wp, ctx, m, rs, qkv)


def _bwd_group(b: int, c: int) -> int:
    """Images per backward grid step (MVT_ATTN_BWD_GROUP overrides).

    Default 4: measured on v5e at ViT-S/16 batch 512 — the accumulator
    RMW amortization wins until the unrolled loop's ~2MB/image stack
    crowds out block double-buffering.

    dim<256 (ViT-Tiny) prefers 8 — v5e Tiny-shape sweep (B=512):
    g=8 3.06 ms vs g=4 3.08 ms vs g=16 3.32 ms per block fwd+bwd.
    dim>512 (ViT-Base) prefers 2 — v5e Base-shape sweep (B=256):
    g=2 9.44 ms vs g=4 9.93 ms fwd+bwd (the 2.4x larger per-image
    stack crowds double-buffering at g=4, per the rule above)."""
    import os

    env = os.environ.get("MVT_ATTN_BWD_GROUP")
    if env:
        g = int(env)
        return g if b % g == 0 else 1
    if c < 256:
        prefs = (8, 4, 2)
    elif c <= 512:
        prefs = (4, 2)
    else:
        prefs = (2,)
    for g in prefs:
        if b % g == 0:
            return g
    return 1


def _bwd_rule(heads, scale, qspec, res_scale, depth, res, do, qs=None):
    x, scale_ln, bias_ln, wqkv, bqkv, wp, ctx, m, rs, qkv = res
    b, n, c = x.shape
    cl = wp.shape[0]  # local attention width (== c unless head-sharded)
    d = cl // heads
    g = _cap_group(_bwd_group(b, c), b, n, heads, d)

    row = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    ctx_row = pl.BlockSpec((g, n, cl), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    hn = pl.BlockSpec((g, heads, n), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        row, vec_c, vec_c,
        rep((c, 3 * cl)), rep((3 * cl,)), rep((cl, c)),
        row, ctx_row, hn, hn,
    ]
    extra_in = ()
    if qkv is not None:
        in_specs.append(
            pl.BlockSpec((g, n, 3 * cl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        extra_in = (qkv,)
    if qspec == "int8":
        in_specs.append(
            pl.BlockSpec(qs.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        extra_in = extra_in + (qs.astype(jnp.float32),)
    f32 = jnp.float32
    dx, dscale, dbias, dw, dbq, dwp, dbp = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, heads=heads, group=g, qspec=qspec,
            res_scale=res_scale, save_qkv=qkv is not None,
        ),
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=(
            row, vec_c, vec_c,
            rep((c, 3 * cl)), rep((3 * cl,)), rep((cl, c)),
            vec_c,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, 3 * cl), f32),
            jax.ShapeDtypeStruct((3 * cl,), f32),
            jax.ShapeDtypeStruct((cl, c), f32),
            jax.ShapeDtypeStruct((c,), f32),
        ),
        # the grouped kernel's unrolled loop keeps ~2MB/image of stack
        # live past the 16MB default scoped-vmem limit; v5e has 128MB
        # VMEM so raise the per-kernel ceiling instead of shrinking g
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(x, scale_ln.astype(x.dtype), bias_ln.astype(x.dtype),
      wqkv.astype(x.dtype), bqkv.astype(f32), wp.astype(x.dtype),
      do.astype(x.dtype), ctx, m, rs, *extra_in)

    return (
        dx,
        dscale.astype(scale_ln.dtype),
        dbias.astype(bias_ln.dtype),
        dw.astype(wqkv.dtype),
        dbq.astype(bqkv.dtype),
        dwp.astype(wp.dtype),
        dbp.astype(jnp.float32),
    )


fused_attention_block.defvjp(_fwd_rule, _bwd_rule)


# --------------------------------------------------------------------------
# Two-pass INT8 QAT variant (stateful observers frozen for the pass)
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_attention_block_i8(x, scale_ln, bias_ln, wqkv, bqkv, wp, bp,
                             qs, heads, scale, depth=None):
    """:func:`fused_attention_block` with PyTorchINT8 observer-site
    fake-quant applied in-kernel at the 5 stateful sites of the
    discrete path (models/vit.py Block): attn_norm.act_out,
    to_qkv.act_out, attn.quant_out, to_out.act_out, attn_res — rows
    0-4 of ``qs`` (5, 3) = per-site (scale, zero_point, has_stats).

    This is the differentiated second pass of the two-pass INT8 QAT
    train step (training/classification.py): the observer pass has
    already folded the current batch into the running min/max, so the
    frozen ``qs`` grids equal what the discrete update-then-use
    composition would use, and the forward is bit-identical to it
    (min/max updates are idempotent; tests/test_fused_int8_qat.py).
    Gradients treat the sites and ``qs`` as straight-through /
    constant, matching the discrete path's zero-cotangent STEs
    (ops/fake_quant.py int8_affine_fake_quant_ste).  Dots run the same
    3-pass HIGH-grade decomposition as the discrete calibrating
    forward (QDense matmul_high3), and weights must arrive already
    fake-quantized (the caller's STE carries their gradient).
    Reference semantics: torch prepare_qat observers + FakeQuantize
    (reference src/myrtle_vision/utils/quantize.py:230-251)."""
    return _attn_forward(
        x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale,
        qspec="int8", qs=qs,
    )


def _fwd_rule_i8(x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, qs, heads,
                 scale, depth):
    b, n, _ = x.shape
    cl = wp.shape[0]
    sv = save_acts(b * n * 3 * cl * jnp.dtype(x.dtype).itemsize, depth)
    outs = _attn_forward(
        x, scale_ln, bias_ln, wqkv, bqkv, wp, bp, heads, scale,
        save_stats=True, qspec="int8", save_qkv=sv, qs=qs,
    )
    if sv:
        out, ctx, m, rs, qkv = outs
    else:
        (out, ctx, m, rs), qkv = outs, None
    return out, (x, scale_ln, bias_ln, wqkv, bqkv, wp, ctx, m, rs, qkv,
                 qs)


def _bwd_rule_i8(heads, scale, depth, res, do):
    *res_core, qs = res
    grads = _bwd_rule(
        heads, scale, "int8", 1.0, depth, tuple(res_core), do, qs=qs
    )
    return grads + (jnp.zeros_like(qs),)


fused_attention_block_i8.defvjp(_fwd_rule_i8, _bwd_rule_i8)
