"""Unit tests for the fake-quant primitives (QPyTorch-replacement tier).

Golden values chosen by hand from the format definitions
(reference: src/myrtle_vision/utils/quantize.py:23-74).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtle_vision_tpu.ops import fake_quant as fq


class TestFixedPoint:
    def test_representable_values_pass_through(self):
        # wl=11, fl=8: quantum 1/256, range [-4, 4 - 1/256]
        xs = np.array([0.0, 1.0, -1.0, 0.25, 3.99609375, -4.0], np.float32)
        out = fq.fixed_point_quantize(jnp.array(xs), 11, 8)
        np.testing.assert_array_equal(np.asarray(out), xs)

    def test_rounding_to_quantum(self):
        out = fq.fixed_point_quantize(jnp.array([0.3]), 11, 8)
        assert np.asarray(out)[0] == pytest.approx(77 / 256)

    def test_clamping(self):
        out = fq.fixed_point_quantize(jnp.array([100.0, -100.0]), 11, 8)
        np.testing.assert_allclose(
            np.asarray(out), [4.0 - 1 / 256, -4.0], rtol=0
        )

    @pytest.mark.parametrize("fl", [7, 8, 9])
    def test_all_reference_formats_idempotent(self, fl):
        x = jnp.array(np.random.RandomState(0).randn(1000).astype(np.float32))
        once = fq.fixed_point_quantize(x, 11, fl)
        twice = fq.fixed_point_quantize(once, 11, fl)
        np.testing.assert_array_equal(np.asarray(once), np.asarray(twice))


class TestFloatQuantize:
    def test_e5m10_matches_ieee_fp16(self):
        rng = np.random.RandomState(1)
        x = np.concatenate(
            [
                rng.randn(4096).astype(np.float32) * 10,
                rng.randn(1024).astype(np.float32) * 1e-5,  # subnormal range
                np.array([0.0, -0.0, 65504.0, -65504.0], np.float32),
            ]
        )
        ours = np.asarray(fq.float_quantize(jnp.array(x), 5, 10))
        ieee = x.astype(np.float16).astype(np.float32)
        np.testing.assert_array_equal(ours, ieee)

    def test_e5m10_saturates_instead_of_inf(self):
        out = np.asarray(fq.float_quantize(jnp.array([1e6, -1e6]), 5, 10))
        np.testing.assert_array_equal(out, [65504.0, -65504.0])

    def test_tf32_mantissa_rounding(self):
        # 1 + 2^-11 rounds to 1.0 (ties-to-even at 10 mantissa bits)
        x = jnp.array([1.0 + 2.0 ** -11, 1.0 + 3 * 2.0 ** -11], jnp.float32)
        out = np.asarray(fq.float_quantize(x, 8, 10))
        np.testing.assert_array_equal(out, [1.0, 1.0 + 2.0 ** -9])

    def test_tf32_idempotent(self):
        x = jnp.array(np.random.RandomState(2).randn(4096).astype(np.float32))
        once = fq.float_quantize(x, 8, 10)
        twice = fq.float_quantize(once, 8, 10)
        np.testing.assert_array_equal(np.asarray(once), np.asarray(twice))


class TestPallasKernels:
    """The Pallas kernels must agree bit-exactly with the jnp numerics."""

    def test_fixed_point_pallas_matches(self):
        x = jnp.array(
            np.random.RandomState(3).randn(37, 129).astype(np.float32) * 4
        )
        a = fq.fixed_point_quantize(x, 11, 8)
        b = fq.fixed_point_quantize_pallas(x, 11, 8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_float_pallas_matches(self):
        x = jnp.array(
            np.random.RandomState(4).randn(1000).astype(np.float32) * 100
        )
        a = fq.float_quantize(x, 5, 10)
        b = fq.float_quantize_pallas(x, 5, 10)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSTE:
    def test_gradient_passes_through_unchanged(self):
        # reference QuantizerFunction.backward returns grad unchanged
        # (quantize.py:87-89)
        x = jnp.array([0.3, 100.0, -100.0, 1e-9])

        def f(x):
            return jnp.sum(fq.fixed_point_quantize_ste(x, 11, 8) * 2.0)

        g = jax.grad(f)(x)
        np.testing.assert_array_equal(np.asarray(g), [2.0, 2.0, 2.0, 2.0])

    def test_float_ste_gradient(self):
        x = jnp.array([1.5, -2.5])
        g = jax.grad(lambda x: jnp.sum(fq.float_quantize_ste(x, 5, 10)))(x)
        np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0])


class TestInt8:
    def test_affine_roundtrip_of_grid_points(self):
        scale, zp = jnp.float32(0.1), jnp.float32(30.0)
        x = (jnp.arange(0, 256, dtype=jnp.float32) - zp) * scale
        out = fq.int8_affine_fake_quant(x, scale, zp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_affine_clamps(self):
        out = fq.int8_affine_fake_quant(
            jnp.array([1e9, -1e9]), jnp.float32(0.1), jnp.float32(30.0)
        )
        np.testing.assert_allclose(
            np.asarray(out), [(255 - 30) * 0.1, -30 * 0.1], rtol=1e-6
        )

    def test_symmetric(self):
        out = fq.int8_symmetric_fake_quant(
            jnp.array([0.05, -0.3, 1e9]), jnp.float32(0.1)
        )
        np.testing.assert_allclose(
            np.asarray(out), [0.0, -0.3, 12.7], atol=1e-6
        )


class TestHighPrecisionVJP:
    def test_attention_core_dots_keep_3pass_gradients(self):
        """The unfused quant attention core's score/PV dots must carry
        3-pass (HIGH-grade) GRADIENTS, not just forwards: plain autodiff
        through the hi/lo bf16 split zeroes the lo branch's cotangent
        and runs the transposed dots at DEFAULT (one bf16 pass).  The
        custom-VJP wrappers (ops/high_precision.py bdot_qk_high3 /
        bdot_pv_high3) must land within 2^-14 relative of the fp64
        reference gradient (the 3-pass decomposition keeps ~2^-16
        relative on arbitrary fp32 operands; exact only for snapped
        <=16-bit mantissas), far tighter than bf16-grade ~2^-8."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from myrtle_vision_tpu.ops.high_precision import (
            bdot_pv_high3,
            bdot_qk_high3,
        )

        rng = np.random.RandomState(0)
        q = rng.randn(1, 2, 8, 16).astype(np.float32)
        k = rng.randn(1, 2, 8, 16).astype(np.float32)
        g = rng.randn(1, 2, 8, 8).astype(np.float32)

        def loss(fn, a, b, ct):
            out, vjp = jax.vjp(fn, jnp.asarray(a), jnp.asarray(b))
            return vjp(jnp.asarray(ct))

        dq, dk = loss(bdot_qk_high3, q, k, g)
        # fp64 reference
        q64, k64, g64 = (x.astype(np.float64) for x in (q, k, g))
        dq_ref = np.einsum("bhnm,bhmd->bhnd", g64, k64)
        dk_ref = np.einsum("bhnm,bhnd->bhmd", g64, q64)
        for got, ref in ((dq, dq_ref), (dk, dk_ref)):
            rel = np.abs(np.asarray(got, np.float64) - ref).max() / (
                np.abs(ref).max() + 1e-30
            )
            assert rel < 2 ** -14, rel

        p = rng.rand(1, 2, 8, 8).astype(np.float32)
        v = rng.randn(1, 2, 8, 16).astype(np.float32)
        go = rng.randn(1, 2, 8, 16).astype(np.float32)
        dp, dv = loss(bdot_pv_high3, p, v, go)
        p64, v64, go64 = (x.astype(np.float64) for x in (p, v, go))
        dp_ref = np.einsum("bhnd,bhmd->bhnm", go64, v64)
        dv_ref = np.einsum("bhnm,bhnd->bhmd", p64, go64)
        for got, ref in ((dp, dp_ref), (dv, dv_ref)):
            rel = np.abs(np.asarray(got, np.float64) - ref).max() / (
                np.abs(ref).max() + 1e-30
            )
            assert rel < 2 ** -14, rel
