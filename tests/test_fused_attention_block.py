"""Fused attention block kernel vs the reference jnp composition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtle_vision_tpu.ops.fused_attention_block import fused_attention_block

C, H, N = 64, 2, 50
D = C // H
SCALE = D ** -0.5


def reference(x, scale_ln, bias_ln, wqkv, bqkv, wp, bp):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale_ln + bias_ln
    qkv = xn @ wqkv + bqkv  # (B, N, 3C)
    b, n, _ = x.shape
    qkv = qkv.reshape(b, n, 3, H, D).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * SCALE
    p = jax.nn.softmax(s, -1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, C)
    return x + o @ wp + bp


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(3, N, C) * 0.5, jnp.float32)
    scale_ln = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32)
    bias_ln = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.1, jnp.float32)
    bqkv = jnp.asarray(0.05 * rng.randn(3 * C), jnp.float32)
    wp = jnp.asarray(rng.randn(C, C) * 0.1, jnp.float32)
    bp = jnp.asarray(0.05 * rng.randn(C), jnp.float32)
    return x, scale_ln, bias_ln, wqkv, bqkv, wp, bp


def test_forward_matches_reference():
    args = make_inputs()
    out = fused_attention_block(*args, H, SCALE)
    ref = reference(*args)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
    )


def test_gradients_match_reference():
    args = make_inputs(1)
    g = jnp.asarray(
        np.random.RandomState(2).randn(*args[0].shape), jnp.float32
    )

    def f_fused(*a):
        return jnp.vdot(fused_attention_block(*a, H, SCALE), g)

    def f_ref(*a):
        return jnp.vdot(reference(*a), g)

    grads_fused = jax.grad(f_fused, argnums=tuple(range(7)))(*args)
    grads_ref = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    names = ["x", "ln_scale", "ln_bias", "wqkv", "bqkv", "wp", "bp"]
    for a, b, name in zip(grads_fused, grads_ref, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_runs():
    args = make_inputs(3)
    x = args[0].astype(jnp.bfloat16)
    out = fused_attention_block(x, *args[1:], H, SCALE)
    assert out.dtype == jnp.bfloat16
    ref = reference(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.1, atol=0.1
    )


@pytest.mark.parametrize("batch,group", [(8, 8), (8, 2), (6, 2)])
def test_grouped_backward_matches_reference(batch, group, monkeypatch):
    """Multi-image backward programs (images grouped per grid step to
    amortize the weight-grad accumulator read-modify-write)."""
    monkeypatch.setenv("MVT_ATTN_BWD_GROUP", str(group))
    rng = np.random.RandomState(7)
    args = list(make_inputs(4))
    args[0] = jnp.asarray(rng.randn(batch, N, C) * 0.5, jnp.float32)
    g = jnp.asarray(rng.randn(batch, N, C), jnp.float32)

    def f_fused(*a):
        return jnp.vdot(fused_attention_block(*a, H, SCALE), g)

    def f_ref(*a):
        return jnp.vdot(reference(*a), g)

    grads_fused = jax.grad(f_fused, argnums=tuple(range(7)))(*args)
    grads_ref = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(grads_fused, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_vmem_gate_and_group_caps():
    """Long sequences must not fuse (detection at 800px eval) and group
    sizes must shrink with sequence length to respect the VMEM ceiling."""
    from myrtle_vision_tpu.ops.fused_attention_block import (
        _cap_group,
        fuses_at,
    )

    assert fuses_at(197, 6, 64)       # ViT-S/16 @ 224
    assert fuses_at(297, 6, 64)       # detection train tokens @ 224
    assert not fuses_at(2601, 6, 64)  # detection eval @ 800
    assert _cap_group(8, 512, 197, 6, 64) == 8
    assert _cap_group(8, 512, 297, 6, 64) == 4   # larger seq -> smaller g
    assert _cap_group(8, 512, 2601, 6, 64) == 1
    assert _cap_group(8, 6, 197, 6, 64) == 2     # divisibility respected
