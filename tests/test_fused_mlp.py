"""Fused MLP block kernel vs the reference jnp composition (fwd + grads)."""
import jax
import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.ops.fused_mlp import fused_mlp_block

D, H = 64, 256


def reference(x, scale, bias, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    h = xn @ w1 + b1
    g = jax.nn.gelu(h, approximate=False)
    return x + g @ w2 + b2


def make_inputs(rows=70, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, rows, D), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.randn(D), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
    w1 = jnp.asarray(rng.randn(D, H) * 0.1, jnp.float32)
    b1 = jnp.asarray(0.1 * rng.randn(H), jnp.float32)
    w2 = jnp.asarray(rng.randn(H, D) * 0.1, jnp.float32)
    b2 = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
    return x, scale, bias, w1, b1, w2, b2


def test_forward_matches_reference():
    args = make_inputs()
    out = fused_mlp_block(*args)
    ref = reference(*args)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_forward_with_row_padding():
    # rows not a multiple of the row block -> padded path
    args = make_inputs(rows=3)
    out = fused_mlp_block(*args)
    ref = reference(*args)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_gradients_match_reference():
    args = make_inputs(rows=40)
    g = jnp.asarray(
        np.random.RandomState(1).randn(*args[0].shape), jnp.float32
    )

    def f_fused(*a):
        return jnp.vdot(fused_mlp_block(*a), g)

    def f_ref(*a):
        return jnp.vdot(reference(*a), g)

    grads_fused = jax.grad(f_fused, argnums=tuple(range(7)))(*args)
    grads_ref = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    names = ["x", "scale", "bias", "w1", "b1", "w2", "b2"]
    for a, b, name in zip(grads_fused, grads_ref, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_runs():
    args = make_inputs()
    x = args[0].astype(jnp.bfloat16)
    out = fused_mlp_block(x, *args[1:])
    assert out.dtype == jnp.bfloat16
    ref = reference(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.1, atol=0.1
    )
