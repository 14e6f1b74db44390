"""ViT backbone tests: shapes, decoders, quant formats, pos-embed interp.

Tiny model dims keep CPU runtime small while exercising every code path
(reference model assembly: src/myrtle_vision/models/vit.py:164-396).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtle_vision_tpu.models.vit import ViT, interpolate_pos_embedding
from myrtle_vision_tpu.quantize import QFormat

TINY = dict(
    image_size=80,
    patch_size=16,  # 5x5 = 25 patches > MIN_NUM_PATCHES
    num_classes=7,
    dim=64,
    depth=1,
    heads=1,
    mlp_dim=128,
    dim_head=64,
    num_det_tokens=10,
    dtype=jnp.float32,
)

_VARIABLES_CACHE = {}


def make(decoder, **over):
    kwargs = dict(TINY, **over)
    return ViT(decoder=decoder, **kwargs)


def cached_variables(model, img_shape=(1, 80, 80, 3)):
    """Param shapes are format-independent; share inits across tests (XLA
    compiles are expensive on CI hosts)."""
    key = (model.decoder, model.q_format, img_shape)
    if key not in _VARIABLES_CACHE:
        _VARIABLES_CACHE[key] = model.init(
            jax.random.PRNGKey(0), jnp.zeros(img_shape)
        )
    return _VARIABLES_CACHE[key]


def init_and_apply(model, img, **apply_kwargs):
    variables = cached_variables(model, (1,) + img.shape[1:])
    return model.apply(variables, img, **apply_kwargs), variables


class TestShapes:
    def test_classification(self):
        img = jnp.zeros((2, 80, 80, 3))
        out, _ = init_and_apply(make("classification"), img)
        assert out.shape == (2, 7)

    def test_segmentation(self):
        img = jnp.zeros((2, 80, 80, 3))
        out, _ = init_and_apply(make("segmentation"), img)
        assert out.shape == (2, 80, 80, 7)  # NHWC pixel logits

    def test_detection(self):
        img = jnp.zeros((2, 80, 80, 3))
        out, _ = init_and_apply(make("detection"), img)
        assert out["pred_logits"].shape == (2, 10, 8)  # +1 no-object
        assert out["pred_boxes"].shape == (2, 10, 4)
        boxes = np.asarray(out["pred_boxes"])
        assert (boxes >= 0).all() and (boxes <= 1).all()

    def test_detection_larger_image_interpolates_pos(self):
        model = make("detection")
        img = jnp.zeros((1, 80, 80, 3))
        variables = cached_variables(model)
        # 160px -> 10x10 grid, pos embedding interpolated on the fly
        out = model.apply(variables, jnp.zeros((1, 160, 160, 3)))
        assert out["pred_logits"].shape == (1, 10, 8)

    def test_min_patches_guard(self):
        with pytest.raises(AssertionError):
            init_and_apply(
                make("classification", image_size=64),
                jnp.zeros((1, 64, 64, 3)),
            )

    def test_bad_decoder_rejected(self):
        with pytest.raises(AssertionError):
            init_and_apply(make("captioning"), jnp.zeros((1, 80, 80, 3)))


class TestPosEmbedInterp:
    def test_same_size_is_identity(self):
        pe = jnp.array(np.random.RandomState(0).randn(1, 196, 8), jnp.float32)
        out = interpolate_pos_embedding(pe, 14, 14)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(pe))

    def test_bicubic_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(1)
        pe = rng.randn(1, 196, 6).astype(np.float32)
        ours = np.asarray(
            interpolate_pos_embedding(jnp.array(pe), 20, 20)
        )
        t = torch.from_numpy(pe).transpose(1, 2).reshape(1, 6, 14, 14)
        ref = torch.nn.functional.interpolate(
            t, size=(20, 20), mode="bicubic", align_corners=False
        )
        ref = ref.reshape(1, 6, 400).transpose(1, 2).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_bicubic_downscale_matches_torch(self):
        torch = pytest.importorskip("torch")
        pe = np.random.RandomState(2).randn(1, 196, 4).astype(np.float32)
        ours = np.asarray(interpolate_pos_embedding(jnp.array(pe), 5, 5))
        t = torch.from_numpy(pe).transpose(1, 2).reshape(1, 4, 14, 14)
        ref = torch.nn.functional.interpolate(
            t, size=(5, 5), mode="bicubic", align_corners=False
        ).reshape(1, 4, 25).transpose(1, 2).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_bilinear_upsample_matches_torch(self):
        torch = pytest.importorskip("torch")
        from myrtle_vision_tpu.ops.interpolate import resize_bilinear

        x = np.random.RandomState(3).randn(1, 14, 14, 4).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.array(x), 224, 224))
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ref = torch.nn.functional.interpolate(
            t, size=(224, 224), mode="bilinear", align_corners=False
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestQuantFormats:
    @pytest.mark.parametrize(
        "fmt", [QFormat.FP16_16, QFormat.FP16_32, QFormat.TF32]
    )
    def test_float_formats_run_and_differ_from_fp32(self, fmt):
        img = jnp.array(
            np.random.RandomState(0).rand(1, 80, 80, 3), jnp.float32
        )
        base, variables = init_and_apply(make("classification"), img)
        model_q = make("classification", q_format=fmt)
        out_q = model_q.apply(variables, img)
        assert out_q.shape == base.shape
        assert not np.allclose(np.asarray(out_q), np.asarray(base))
        # quantization is a small perturbation, not an explosion
        np.testing.assert_allclose(
            np.asarray(out_q), np.asarray(base), atol=0.5
        )

    def test_int8_calibration_flow(self):
        img = jnp.array(
            np.random.RandomState(0).rand(2, 80, 80, 3), jnp.float32
        )
        model = make("classification", q_format=QFormat.PyTorchINT8)
        variables = cached_variables(model, (1, 80, 80, 3))
        # without stats the activations pass through; run calibration
        out1, updates = model.apply(
            variables, img, calibrating=True, mutable=["quant"]
        )
        stats = jax.tree_util.tree_leaves(updates["quant"])
        assert all(np.isfinite(np.asarray(s)).all() for s in stats)
        variables = {**variables, **updates}
        out2 = model.apply(variables, img)
        assert np.isfinite(np.asarray(out2)).all()

    def test_fp32_has_no_quant_state(self):
        img = jnp.zeros((1, 80, 80, 3))
        model = make("classification")
        variables = cached_variables(model)
        assert "quant" not in variables or not jax.tree_util.tree_leaves(
            variables.get("quant", {})
        )


class TestDistillToken:
    def test_returns_pair(self):
        img = jnp.zeros((2, 80, 80, 3))
        model = make("classification")
        variables = cached_variables(model)
        token = jnp.ones((1, 1, TINY["dim"]))
        out, distill = model.apply(variables, img, distill_token=token)
        assert out.shape == (2, 7)
        assert distill.shape == (2, TINY["dim"])


class TestAttentionCapture:
    def test_sows_probs(self):
        img = jnp.zeros((1, 80, 80, 3))
        model = make("classification")
        variables = cached_variables(model)
        _, inter = model.apply(
            variables, img, capture_attention=True, mutable=["intermediates"]
        )
        probs = jax.tree_util.tree_leaves(inter["intermediates"])
        assert probs[0].shape == (1, 1, 26, 26)  # (b, heads, n, n)
        np.testing.assert_allclose(
            np.asarray(probs[0]).sum(-1), 1.0, rtol=1e-5
        )


class TestGradients:
    def test_train_grad_finite_all_formats(self):
        img = jnp.array(
            np.random.RandomState(0).rand(2, 80, 80, 3), jnp.float32
        )
        labels = jnp.array([1, 3])
        for fmt in [QFormat.FP32, QFormat.FP16_16, QFormat.TF32]:
            model = make("classification", q_format=fmt)
            variables = cached_variables(model, (1, 80, 80, 3))

            def loss_fn(params):
                logits = model.apply({"params": params}, img)
                onehot = jax.nn.one_hot(labels, 7)
                return -jnp.mean(
                    jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)
                )

            grads = jax.grad(loss_fn)(variables["params"])
            for g in jax.tree_util.tree_leaves(grads):
                assert np.isfinite(np.asarray(g)).all()


class TestUnfusedBlockRemat:
    """The unfused quant composition (stateful PyTorchINT8, or
    MVT_NO_FUSE) wraps each transformer Block in nn.remat so the
    custom-VJP 3-pass dot residuals — every layer's (b, h, n, n) fp32
    attention probs among them — are recomputed in the backward instead
    of pinned in HBM (31.8GB at ViT-S QAT batch 512 on a 16GB chip).
    Remat reruns the same ops on the same inputs: EAGER gradients are
    bit-identical to the un-remat'd composition.  Jitted programs fuse
    differently with remat boundaries, so those agree to fp32 roundoff
    only (same caveat as ROUND3_NOTES "bit-identity is a property of
    compiled programs")."""

    def test_int8_qat_grads_match_with_and_without_remat(self):
        import flax.linen as nn

        from myrtle_vision_tpu.models.vit import Block

        B = Block(64, 2, 32, 128, 0.0, QFormat.PyTorchINT8)
        RB = nn.remat(Block, static_argnums=(2, 3, 4))(
            64, 2, 32, 128, 0.0, QFormat.PyTorchINT8
        )
        x = jax.random.normal(
            jax.random.PRNGKey(0), (2, 5, 64), jnp.float32
        )
        v = B.init(jax.random.PRNGKey(1), x, True, False, False)

        def loss(params, mod):
            out, _ = mod.apply(
                {"params": params, "quant": v["quant"]},
                x, True, True, False, mutable=["quant"],
            )
            return jnp.sum(out ** 2)

        # eager: identical ops on identical inputs -> identical bits
        g_plain = jax.grad(loss)(v["params"], B)
        g_remat = jax.grad(loss)(v["params"], RB)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_plain),
            jax.tree_util.tree_leaves(g_remat),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # jitted: different fusion boundaries -> fp32 roundoff only
        gj_plain = jax.jit(jax.grad(loss), static_argnums=1)(
            v["params"], B
        )
        gj_remat = jax.jit(jax.grad(loss), static_argnums=1)(
            v["params"], RB
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(gj_plain),
            jax.tree_util.tree_leaves(gj_remat),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
            )

    def test_transformer_selects_remat_for_stateful_formats(self):
        """The INT8 QAT train path must stay remat'd (HBM ceiling);
        FP32 must stay un-remat'd (the fused kernels own its
        residuals). Asserted on the lowered jaxpr."""
        from myrtle_vision_tpu.models.vit import Transformer

        x = jnp.zeros((1, 5, 64), jnp.float32)

        def jaxpr_for(fmt):
            t = Transformer(
                64, 1, 2, 32, 128, 0.0, fmt, dtype=jnp.float32
            )
            v = t.init(jax.random.PRNGKey(0), x, True, False, False)

            def f(params):
                out, _ = t.apply(
                    {"params": params, **{
                        k: v[k] for k in v if k != "params"
                    }},
                    x, True, True, False,
                    mutable=list(k for k in v if k != "params"),
                )
                return jnp.sum(out ** 2)

            return str(jax.make_jaxpr(jax.grad(f))(v["params"]))

        assert "remat" in jaxpr_for(QFormat.PyTorchINT8)
        assert "remat" not in jaxpr_for(QFormat.FP32)
