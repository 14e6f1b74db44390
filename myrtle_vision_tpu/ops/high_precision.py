"""Manual 3-pass bf16 fp32 contraction (XLA ``Precision.HIGH``'s cost)
usable inside Mosaic kernels.

Mosaic implements only DEFAULT and HIGHEST dot precisions (probe:
``NotImplementedError: Unsupported dot precision: HIGH``), but the
quantization simulation only needs HIGH-grade fp32 contraction: round
2's PTQ parity measurements (BASELINE.md row 3 — exact top-1 parity
incl. 768/768 prediction agreement vs the reference's torch fp32 stack,
reference src/myrtle_vision/utils/quantize.py sites) ran the
discrete-site path at ``Precision.HIGH``.  HIGHEST costs ~6 MXU passes
per fp32 dot on v5e where HIGH costs 3 — and the quant-sim step is dot
dominated, so the r3 HIGHEST-based fused quant kernels measured only
691 img/s train vs 3518 for the bf16 path.

Decomposition (the hardware 3-pass recipe): ``x = hi + lo`` with
``hi = bf16(x)`` (RNE) and ``lo = bf16(x - hi)``;
``dot(a, b) = ah@bh + ah@bl + al@bh`` accumulated in fp32, dropping the
~2^-16-relative ``al@bl`` term.  For fp16/tf32-snapped operands (11-bit
mantissas) ``hi + lo`` represents the operand EXACTLY, so only the
dropped cross term and fp32 accumulation order separate this from a
true fp32 contraction.

Because BOTH the discrete QDense/attention path (models/vit.py,
ops/attention.py) and the fused Pallas kernels
(ops/fused_attention_block.py, ops/fused_mlp.py) call these same
functions, the two paths stay bit-identical by construction
(tests/test_golden_values.py::TestFusedQuantBitIdentity).
"""
from functools import partial

import jax
import jax.numpy as jnp


def _split(x):
    """x (fp32) -> (hi, lo) bf16 pair with hi + lo ~= x (exact for
    operands of <= 16 significant bits)."""
    x = x.astype(jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot_high3(a, b, dimension_numbers):
    """3-pass fp32 dot_general.  Fixed summation order
    (ah@bh + ah@bl) + al@bh so every caller agrees bitwise."""
    ah, al = _split(a)
    bh, bl = _split(b)
    d = partial(
        jax.lax.dot_general,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32,
        # pin DEFAULT: these operands are bf16, so the env's matmul
        # precision default (the true-fp32 recipe sets 'highest') is
        # both illegal under Mosaic and a numerical no-op here
        precision=jax.lax.Precision.DEFAULT,
    )
    return (d(ah, bh) + d(ah, bl)) + d(al, bh)


def _mm_dims(x, w):
    # (..., K) @ (K, N): contract x's last axis with w's first
    return (((x.ndim - 1,), (0,)), ((), ()))


@jax.custom_vjp
def matmul_high3(x, w):
    """(..., K) @ (K, N) at 3-pass precision, with a backward that runs
    the SAME 3-pass decomposition on the incoming gradient (plain
    autodiff through the hi/lo split would silently drop the gradient's
    low bf16 half: the ``lo`` branch's cotangent is zero because
    d/dx [x - cast(x)] = 0)."""
    return dot_high3(x, w, _mm_dims(x, w))


def _mm_fwd(x, w):
    return matmul_high3(x, w), (x, w)


def _mm_bwd(res, do):
    x, w = res
    do = do.astype(jnp.float32)
    # dx = do @ w^T  (contract do's last with w's last)
    dx = dot_high3(
        do, w, (((do.ndim - 1,), (1,)), ((), ()))
    )
    # dw = x^T @ do: contract all leading (batch/row) axes
    lead = tuple(range(x.ndim - 1))
    dw = dot_high3(x, do, ((lead, lead), ((), ())))
    return dx.astype(x.dtype), dw.astype(w.dtype)


matmul_high3.defvjp(_mm_fwd, _mm_bwd)


# Batched attention-core contractions with 3-pass backward.  The
# unfused quant attention path (ops/attention.py) differentiates through
# its score and PV dots; bare ``dot_high3`` under autodiff silently
# drops the cotangent's low bf16 half (same pitfall matmul_high3 fixes),
# so these wrap the two (b, h, ...) contractions with hand-written
# 3-pass backward dots.

_B2 = ((0, 1), (0, 1))  # leading (batch, heads) axes


@jax.custom_vjp
def bdot_qk_high3(q, k):
    """scores[b,h,n,m] = sum_d q[b,h,n,d] * k[b,h,m,d] at 3-pass
    precision (fp32 in/out)."""
    return dot_high3(q, k, (((3,), (3,)), _B2))


def _qk_fwd(q, k):
    return bdot_qk_high3(q, k), (q, k)


def _qk_bwd(res, ds):
    q, k = res
    ds = ds.astype(jnp.float32)
    dq = dot_high3(ds, k, (((3,), (2,)), _B2))  # sum_m ds[...,n,m] k[...,m,d]
    dk = dot_high3(ds, q, (((2,), (2,)), _B2))  # sum_n ds[...,n,m] q[...,n,d]
    return dq.astype(q.dtype), dk.astype(k.dtype)


bdot_qk_high3.defvjp(_qk_fwd, _qk_bwd)


@jax.custom_vjp
def bdot_pv_high3(p, v):
    """out[b,h,n,d] = sum_m p[b,h,n,m] * v[b,h,m,d] at 3-pass
    precision (fp32 in/out)."""
    return dot_high3(p, v, (((3,), (2,)), _B2))


def _pv_fwd(p, v):
    return bdot_pv_high3(p, v), (p, v)


def _pv_bwd(res, g):
    p, v = res
    g = g.astype(jnp.float32)
    dp = dot_high3(g, v, (((3,), (3,)), _B2))  # sum_d g[...,n,d] v[...,m,d]
    dv = dot_high3(p, g, (((2,), (2,)), _B2))  # sum_n p[...,n,m] g[...,n,d]
    return dp.astype(p.dtype), dv.astype(v.dtype)


bdot_pv_high3.defvjp(_pv_fwd, _pv_bwd)
