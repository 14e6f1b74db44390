"""Two-pass fused INT8 QAT training step (VERDICT r4 item 5).

The discrete one-pass INT8 QAT step runs torch's update-then-use
observer semantics (each site folds the batch into its running min/max,
then fake-quantizes with the updated stats — reference
src/myrtle_vision/utils/quantize.py:230-251) through the unfused
composition under block remat.  The two-pass step
(training/classification.py make_loss_fn) splits this into an observer
pass (no gradient) plus a differentiated pass through the fused Pallas
block kernels with the frozen post-batch grids
(ops/fused_attention_block.py fused_attention_block_i8,
ops/fused_mlp.py fused_mlp_block_i8).

The equivalence argument these tests pin down:

1. MinMax observer updates are IDEMPOTENT — re-folding the same batch
   changes nothing — and each site's update-then-use grid IS its
   post-batch grid.  So the one-pass forward output equals the same
   forward re-run with the already-updated stats.
2. The fused kernels apply the same affine uint8 snaps at the same
   site positions with the same 3-pass HIGH-grade dots and shared
   polynomial GELU, so fused(frozen stats) is bit-identical to
   discrete(frozen stats).
3. Gradients: qparams carry zero cotangent in BOTH paths (the discrete
   STEs return (g, None, None); the fused kernels treat qs as
   constant), so the two-pass gradient equals the one-pass gradient up
   to backward accumulation order.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtle_vision_tpu.models.vit import ViT
from myrtle_vision_tpu.quantize import QFormat


def _build():
    model = ViT(
        decoder="classification", image_size=80, patch_size=16,
        num_classes=4, dim=32, depth=2, heads=2, mlp_dim=64,
        dim_head=16, q_format=QFormat.PyTorchINT8, dtype=jnp.float32,
    )
    img = jnp.asarray(
        np.linspace(-1, 1, 2 * 80 * 80 * 3).reshape(2, 80, 80, 3),
        jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(7), img)
    return model, variables, img


def _tree_equal(a, b, what):
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(a)[0],
        jax.tree_util.tree_flatten_with_path(b)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lb), err_msg=f"{what}: {pa}"
        )


class TestTwoPassEquivalence:
    def test_observer_update_idempotent_and_forward_matches(self):
        model, variables, img = _build()
        params, quant = variables["params"], variables["quant"]

        one_pass = jax.jit(
            lambda p, q, x: model.apply(
                {"params": p, "quant": q}, x, calibrating=True,
                mutable=["quant"],
            )
        )
        out1, upd1 = one_pass(params, quant, img)
        quant2 = upd1["quant"]

        # idempotence: re-folding the same batch changes nothing
        out_again, upd2 = one_pass(params, quant2, img)
        _tree_equal(upd2["quant"], quant2, "observer re-update")
        # update-then-use == use-post-batch-stats
        np.testing.assert_array_equal(
            np.asarray(out1), np.asarray(out_again)
        )

        # fused pass with the frozen grids: bit-identical logits
        fused = jax.jit(
            lambda p, q, x: model.apply(
                {"params": p, "quant": q}, x, calibrating=True,
                int8_fused=True, mutable=["quant"],
            )
        )
        out_fused, upd_f = fused(params, quant2, img)
        np.testing.assert_array_equal(
            np.asarray(out_fused), np.asarray(out1),
            err_msg="fused pass-2 logits != discrete one-pass logits",
        )
        # the fused pass's own (non-block-site) re-updates are no-ops
        _tree_equal(upd_f["quant"], quant2, "fused pass re-update")

    def test_gradients_match(self):
        model, variables, img = _build()
        params, quant = variables["params"], variables["quant"]
        # populate the observers once so both paths run with stats
        _, upd = model.apply(
            variables, img, calibrating=True, mutable=["quant"]
        )
        quant0 = upd["quant"]

        def loss_one(p):
            out, _ = model.apply(
                {"params": p, "quant": quant0}, img, calibrating=True,
                mutable=["quant"],
            )
            return jnp.sum(out ** 2)

        def loss_two(p):
            _, u = model.apply(
                {
                    "params": jax.lax.stop_gradient(p),
                    "quant": quant0,
                },
                img, calibrating=True, mutable=["quant"],
            )
            q2 = jax.lax.stop_gradient(u["quant"])
            out, _ = model.apply(
                {"params": p, "quant": q2}, img, calibrating=True,
                int8_fused=True, mutable=["quant"],
            )
            return jnp.sum(out ** 2)

        l1, g1 = jax.jit(jax.value_and_grad(loss_one))(params)
        l2, g2 = jax.jit(jax.value_and_grad(loss_two))(params)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5,
                err_msg=f"grad mismatch at {pa}",
            )

    def test_trainer_loss_fn_two_pass_equals_one_pass(self, monkeypatch):
        from myrtle_vision_tpu.training.classification import (
            make_loss_fn,
        )

        model, variables, img = _build()
        params, quant = variables["params"], variables["quant"]
        batch = {"image": img, "label": jnp.asarray([1, 3])}
        rng = jax.random.PRNGKey(3)

        monkeypatch.setenv("MVT_INT8_QAT_FUSE", "0")
        loss_fn_1 = make_loss_fn(model)
        monkeypatch.setenv("MVT_INT8_QAT_FUSE", "1")
        loss_fn_2 = make_loss_fn(model)

        grad1 = jax.jit(jax.value_and_grad(loss_fn_1, has_aux=True))
        grad2 = jax.jit(jax.value_and_grad(loss_fn_2, has_aux=True))
        (l1, aux1), g1 = grad1(params, quant, batch, rng)
        (l2, aux2), g2 = grad2(params, quant, batch, rng)

        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        _tree_equal(aux1["quant"], aux2["quant"], "updated observers")
        np.testing.assert_array_equal(
            np.asarray(aux1["metrics"]["acc"]),
            np.asarray(aux2["metrics"]["acc"]),
        )
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5,
                err_msg=f"trainer grad mismatch at {pa}",
            )
