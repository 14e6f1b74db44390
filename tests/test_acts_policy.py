"""Residual-saving attention backward (ops/acts_policy.py) vs remat.

The fused attention backward can either recompute the QKV projection
(remat) or read it back as a saved forward residual.  The saved tensor
is the remat's own dot output after the same cast, so the two modes must
agree EXACTLY — in fp32 and in bf16.  These tests force each mode via
MVT_SAVE_ACTS and compare full gradients, and pin the auto budget gate.

(The fused MLP deliberately has no saving mode: streaming its 4x-wider
pre-GELU residual measured slower than the fc1 recompute on v5e — see
ops/fused_mlp.py module docstring.)
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtle_vision_tpu.ops.acts_policy import save_acts
from myrtle_vision_tpu.ops.fused_attention_block import (
    fused_attention_block,
)


@pytest.fixture
def forced_mode():
    """Set MVT_SAVE_ACTS for the duration of one test."""
    prev = os.environ.get("MVT_SAVE_ACTS")

    def force(v):
        os.environ["MVT_SAVE_ACTS"] = v

    yield force
    if prev is None:
        os.environ.pop("MVT_SAVE_ACTS", None)
    else:
        os.environ["MVT_SAVE_ACTS"] = prev


def _attn_args(dtype=jnp.float32):
    rng = np.random.RandomState(0)
    b, n, c, h = 2, 40, 64, 2
    x = jnp.asarray(rng.randn(b, n, c), dtype)
    scale_ln = jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32)
    bias_ln = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    wqkv = jnp.asarray(rng.randn(c, 3 * c) * 0.1, jnp.float32)
    bqkv = jnp.asarray(0.1 * rng.randn(3 * c), jnp.float32)
    wp = jnp.asarray(rng.randn(c, c) * 0.1, jnp.float32)
    bp = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    return (x, scale_ln, bias_ln, wqkv, bqkv, wp, bp), h, (c // h) ** -0.5


def _grads(f, args):
    g = jnp.ones_like(args[0])

    def scalar(*a):
        return jnp.vdot(f(*a).astype(jnp.float32), g.astype(jnp.float32))

    return jax.grad(scalar, argnums=tuple(range(len(args))))(*args)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_attention_saved_equals_remat(forced_mode, dtype):
    args, heads, scale = _attn_args(dtype)

    def f(*a):
        return fused_attention_block(*a, heads, scale)

    forced_mode("1")
    g_saved = _grads(f, args)
    forced_mode("0")
    g_remat = _grads(f, args)
    for a, b in zip(g_saved, g_remat):
        # the saved qkv is the remat's own dot output: exact agreement
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attention_saved_equals_remat_quant(forced_mode):
    # stateless quant format (FP16_32-like qspec): fp32 activations, so
    # the saved rows are again bit-equal to the recompute
    args, heads, scale = _attn_args(jnp.float32)
    qspec = (5, 10, False)

    def f(*a):
        return fused_attention_block(*a, heads, scale, qspec)

    forced_mode("1")
    g_saved = _grads(f, args)
    forced_mode("0")
    g_remat = _grads(f, args)
    for a, b in zip(g_saved, g_remat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_budget_gate():
    prev = dict(os.environ)
    os.environ.pop("MVT_SAVE_ACTS", None)
    os.environ.pop("MVT_SAVE_ACTS_GB", None)
    try:
        gib = 1 << 30
        # 12-layer estimate inside the default 4 GiB budget -> save
        assert save_acts(int(0.3 * gib))
        # over budget -> remat
        assert not save_acts(int(0.4 * gib))
        # env force wins both ways
        os.environ["MVT_SAVE_ACTS"] = "1"
        assert save_acts(10 * gib)
        os.environ["MVT_SAVE_ACTS"] = "0"
        assert not save_acts(1)
        # budget override
        del os.environ["MVT_SAVE_ACTS"]
        os.environ["MVT_SAVE_ACTS_GB"] = "8"
        assert save_acts(int(0.6 * gib))
    finally:
        os.environ.clear()
        os.environ.update(prev)
