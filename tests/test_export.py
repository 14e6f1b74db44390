"""Reference-format checkpoint export/import roundtrip + torch-side load."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtle_vision_tpu.models.vit import ViT
from myrtle_vision_tpu.utils.export import (
    export_torch_state_dict,
    import_torch_state_dict,
    save_torch_checkpoint,
)


def make_params(decoder):
    model = ViT(
        decoder=decoder, image_size=80, patch_size=16, num_classes=3,
        dim=32, depth=2, heads=2, mlp_dim=64, dim_head=16,
        num_det_tokens=5, dtype=jnp.float32,
    )
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 80, 3)))
    return model, v["params"]


@pytest.mark.parametrize(
    "decoder", ["classification", "segmentation", "detection"]
)
def test_roundtrip(decoder):
    model, params = make_params(decoder)
    sd = export_torch_state_dict(params, decoder)
    # reference naming spot checks (reference vit.py module structure)
    assert "transformer.layers.0.0.fn.fn.to_qkv.weight" in sd
    assert sd["transformer.layers.0.0.fn.fn.to_qkv.weight"].shape == (
        96, 32,
    )  # torch (out, in)
    assert "patch_to_embedding.weight" in sd

    # perturb-import: zero one weight, import, confirm the change lands
    sd2 = dict(sd)
    sd2["transformer.layers.1.1.fn.fn.net.0.weight"] = np.zeros_like(
        sd2["transformer.layers.1.1.fn.fn.net.0.weight"]
    )
    merged = import_torch_state_dict(params, sd2, decoder)
    np.testing.assert_array_equal(
        merged["transformer"]["layers_1"]["ffn"]["fc1"]["kernel"], 0.0
    )
    # untouched leaves identical
    np.testing.assert_array_equal(
        merged["cls_token"], np.asarray(params["cls_token"])
    )

    # full roundtrip preserves the forward
    merged_full = import_torch_state_dict(params, sd, decoder)
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, 80, 80, 3), jnp.float32
    )
    a = model.apply({"params": params}, img)
    b = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, merged_full)}, img
    )
    la = a["pred_logits"] if isinstance(a, dict) else a
    lb = b["pred_logits"] if isinstance(b, dict) else b
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


def test_torch_save_loadable(tmp_path):
    torch = pytest.importorskip("torch")
    _, params = make_params("classification")
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(params, "classification", path)
    sd = torch.load(path, weights_only=True)
    w = sd["decoder.linear.weight"]
    assert w.shape == (3, 32)
    np.testing.assert_allclose(
        w.numpy(), np.asarray(params["decoder"]["linear"]["kernel"]).T,
    )


class TestQatNaming:
    def test_qat_wrapped_roundtrip(self):
        """The reference's prepare_qat wraps each Linear/LayerNorm in
        Sequential(stub, module), adding a '.1' path component to every
        module parameter of a stateless-QAT checkpoint.  Export with
        qat_wrapped must emit that naming, and import must accept BOTH
        namings (round-3 bug: a QAT reference checkpoint imported
        silently as a near-init model — chance-level accuracy)."""
        import jax
        import jax.numpy as jnp

        from myrtle_vision_tpu.models.vit import ViT
        from myrtle_vision_tpu.utils.export import (
            export_torch_state_dict,
            import_torch_state_dict,
        )

        model = ViT(
            decoder="classification", image_size=80, patch_size=16,
            num_classes=3, dim=64, depth=1, heads=1, mlp_dim=128,
            dtype=jnp.float32,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 80, 80, 3))
        )["params"]
        sd = export_torch_state_dict(params, "classification",
                                     qat_wrapped=True)
        assert "patch_to_embedding.1.weight" in sd
        assert "decoder.linear.1.weight" in sd
        assert "pos_embedding" in sd  # token params unwrapped

        zeros = jax.tree_util.tree_map(np.zeros_like, params)
        merged = import_torch_state_dict(zeros, sd, "classification")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            merged, jax.tree_util.tree_map(np.asarray, params),
        )

    def test_import_rejects_unrecognized_layout(self):
        import jax
        import jax.numpy as jnp

        from myrtle_vision_tpu.models.vit import ViT
        from myrtle_vision_tpu.utils.export import import_torch_state_dict

        model = ViT(
            decoder="classification", image_size=80, patch_size=16,
            num_classes=3, dim=64, depth=1, heads=1, mlp_dim=128,
            dtype=jnp.float32,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 80, 80, 3))
        )["params"]
        with pytest.raises(ValueError, match="unrecognized"):
            import_torch_state_dict(
                params, {"bogus.weight": np.zeros((1,))}, "classification"
            )
