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


def test_budget_gate_uses_real_depth():
    """The gate scales by the model's REAL depth: a depth-5 micro
    config affords 12/5 = 2.4x the per-layer residual the old
    hardcoded 12-layer assumption allowed, and deeper-than-12 models
    must gate off sooner."""
    prev = dict(os.environ)
    os.environ.pop("MVT_SAVE_ACTS", None)
    os.environ.pop("MVT_SAVE_ACTS_GB", None)
    try:
        gib = 1 << 30
        # per-layer residual that a 12-layer model must reject...
        per_layer = int(0.5 * gib)
        assert not save_acts(per_layer)           # fallback depth 12
        assert not save_acts(per_layer, depth=12)
        # ...fits comfortably for the depth-5 micro configs
        assert save_acts(per_layer, depth=5)      # 2.5 GiB <= 4 GiB
        # and a 24-layer model gates off where 12 layers would fit
        assert save_acts(int(0.3 * gib), depth=12)
        assert not save_acts(int(0.3 * gib), depth=24)
        # None (direct kernel microbenches) == 12-layer fallback
        assert save_acts(int(0.3 * gib), depth=None)
    finally:
        os.environ.clear()
        os.environ.update(prev)


def test_block_threads_model_depth(monkeypatch):
    """models/vit.py passes the Transformer's real depth down to the
    kernel's save_acts gate (VERDICT r4 item 9: the depth-5 micro
    configs were charged a 12-layer budget)."""
    import flax.linen as nn

    from myrtle_vision_tpu.models.vit import Transformer
    from myrtle_vision_tpu.quantize import QFormat
    import myrtle_vision_tpu.ops.fused_attention_block as fab

    seen = []
    real = save_acts

    def spy(extra, depth=None):
        seen.append(depth)
        return real(extra, depth)

    monkeypatch.setattr(fab, "save_acts", spy)

    t = Transformer(
        dim=64, depth=5, heads=2, dim_head=32, mlp_dim=128,
        dropout=0.0, q_format=QFormat.FP32,
    )
    x = jnp.zeros((2, 40, 64), jnp.float32)
    params = t.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(t.apply(p, x))

    jax.grad(loss)(params)  # tracing runs _fwd_rule -> save_acts
    assert seen and all(d == 5 for d in seen)
