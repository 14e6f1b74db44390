"""Flash attention kernels vs the XLA einsum reference (fwd + grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtle_vision_tpu.ops.attention import multi_head_attention
from myrtle_vision_tpu.ops.flash_attention import flash_attention


def ref_attention(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("n", [17, 197, 300])
def test_forward_matches_reference(n):
    rng = np.random.RandomState(0)
    q, k, v = (
        jnp.asarray(rng.randn(2, 3, n, 64), jnp.float32) for _ in range(3)
    )
    scale = 0.125
    out = flash_attention(q, k, v, scale)
    ref = ref_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("n", [64, 197])
def test_gradients_match_reference(n):
    rng = np.random.RandomState(1)
    q, k, v = (
        jnp.asarray(rng.randn(1, 2, n, 64), jnp.float32) for _ in range(3)
    )
    scale = 0.125
    g = jnp.asarray(rng.randn(1, 2, n, 64), jnp.float32)

    def f_flash(q, k, v):
        return jnp.vdot(flash_attention(q, k, v, scale), g)

    def f_ref(q, k, v):
        return jnp.vdot(ref_attention(q, k, v, scale), g)

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_long_sequence_blocked_gradients():
    """n_pad > the unblocked VMEM budget -> blocked online-softmax path
    (forced at small n by shrinking the threshold)."""
    from myrtle_vision_tpu.ops import flash_attention as fa

    old = fa._FULL_SEQ_MAX
    fa._FULL_SEQ_MAX = 128  # force the blocked kernels at small n
    try:
        rng = np.random.RandomState(2)
        q, k, v = (
            jnp.asarray(rng.randn(1, 1, 200, 64), jnp.float32)
            for _ in range(3)
        )
        g = jnp.asarray(rng.randn(1, 1, 200, 64), jnp.float32)
        scale = 0.125

        gf = jax.grad(
            lambda q, k, v: jnp.vdot(flash_attention(q, k, v, scale), g),
            argnums=(0, 1, 2),
        )(q, k, v)
        gr = jax.grad(
            lambda q, k, v: jnp.vdot(ref_attention(q, k, v, scale), g),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
            )
    finally:
        fa._FULL_SEQ_MAX = old


class TestBlockedLongSequence:
    """The reference's 800px detection eval runs 50x50+1+100 = 2601
    tokens (reference detection/data_configs/data_config.json:38) —
    beyond the unblocked kernels' VMEM ceiling.  The blocked kernels
    must match the XLA einsum reference at that exact scale."""

    SCALE = 0.125

    def test_forward_at_2601(self):
        rng = np.random.RandomState(7)
        q, k, v = (
            jnp.asarray(rng.randn(1, 2, 2601, 64), jnp.float32)
            for _ in range(3)
        )
        out = flash_attention(q, k, v, self.SCALE)
        ref = ref_attention(q, k, v, self.SCALE)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_forward_multiple_kv_tiles_uneven(self):
        # n_pad=1664 -> kv_blk=128, 13 tiles (a non-512 tiling)
        rng = np.random.RandomState(8)
        q, k, v = (
            jnp.asarray(rng.randn(1, 1, 1600, 64), jnp.float32)
            for _ in range(3)
        )
        out = flash_attention(q, k, v, self.SCALE)
        ref = ref_attention(q, k, v, self.SCALE)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_forward_masked_n_valid(self):
        rng = np.random.RandomState(9)
        n, n_valid = 2601, 2500
        q, k, v = (
            jnp.asarray(rng.randn(1, 1, n, 64), jnp.float32)
            for _ in range(3)
        )
        out = flash_attention(q, k, v, self.SCALE, n_valid)
        ref = ref_attention(
            q[:, :, :n_valid], k[:, :, :n_valid], v[:, :, :n_valid],
            self.SCALE,
        )
        np.testing.assert_allclose(
            np.asarray(out)[:, :, :n_valid], np.asarray(ref),
            rtol=2e-5, atol=2e-5,
        )

    def test_gradients_at_2601(self):
        rng = np.random.RandomState(10)
        q, k, v = (
            jnp.asarray(rng.randn(1, 1, 2601, 64), jnp.float32)
            for _ in range(3)
        )
        g = jnp.asarray(rng.randn(1, 1, 2601, 64), jnp.float32)

        gf = jax.grad(
            lambda q, k, v: jnp.vdot(
                flash_attention(q, k, v, self.SCALE), g
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        gr = jax.grad(
            lambda q, k, v: jnp.vdot(ref_attention(q, k, v, self.SCALE), g),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=f"d{name} mismatch",
            )

    def test_gradients_masked_n_valid(self):
        rng = np.random.RandomState(11)
        from myrtle_vision_tpu.ops import flash_attention as fa

        old = fa._FULL_SEQ_MAX
        fa._FULL_SEQ_MAX = 128
        try:
            n, n_valid = 256, 200
            q, k, v = (
                jnp.asarray(rng.randn(1, 1, n, 64), jnp.float32)
                for _ in range(3)
            )
            g = jnp.asarray(rng.randn(1, 1, n, 64), jnp.float32)
            # zero upstream grads on padded rows (callers ignore them)
            g = g.at[:, :, n_valid:].set(0.0)

            gf = jax.grad(
                lambda q, k, v: jnp.vdot(
                    flash_attention(q, k, v, self.SCALE, n_valid), g
                ),
                argnums=(0, 1, 2),
            )(q, k, v)
            gr = jax.grad(
                lambda q, k, v: jnp.vdot(
                    ref_attention(
                        q[:, :, :n_valid], k[:, :, :n_valid],
                        v[:, :, :n_valid], self.SCALE,
                    ),
                    g[:, :, :n_valid],
                ),
                argnums=(0, 1, 2),
            )(q, k, v)
            for a, b, name in zip(gf, gr, "qkv"):
                np.testing.assert_allclose(
                    np.asarray(a)[:, :, :n_valid],
                    np.asarray(b)[:, :, :n_valid],
                    rtol=5e-4, atol=5e-4, err_msg=f"d{name} mismatch",
                )
        finally:
            fa._FULL_SEQ_MAX = old


def test_bf16_inputs():
    rng = np.random.RandomState(3)
    q, k, v = (
        jnp.asarray(rng.randn(2, 2, 100, 64), jnp.bfloat16)
        for _ in range(3)
    )
    out = flash_attention(q, k, v, 0.125)
    ref = ref_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        0.125,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )


def test_auto_impl_dispatch():
    rng = np.random.RandomState(4)
    q, k, v = (
        jnp.asarray(rng.randn(1, 2, 50, 64), jnp.float32) for _ in range(3)
    )
    a = multi_head_attention(q, k, v, 0.125, impl="auto")
    b = multi_head_attention(q, k, v, 0.125, impl="xla")
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
    )


def test_group_padding_when_bh_not_divisible():
    """bh=5 doesn't divide the head group size -> padded group path."""
    rng = np.random.RandomState(5)
    q, k, v = (
        jnp.asarray(rng.randn(5, 1, 40, 64), jnp.float32) for _ in range(3)
    )
    out = flash_attention(q, k, v, 0.125)
    ref = ref_attention(q, k, v, 0.125)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
