"""Numerical parity of the full ViT forward against a torch execution of
the same (timm-layout) weights.

This is the SURVEY §7 step-2 check: import a timm-style state dict through
``rename_timm_state_dict`` and match the forward pass without any training.
timm itself is not installed in this image, so the golden values come from
executing a minimal timm-equivalent ViT in torch (pre-norm blocks, fused
QKV, exact GELU, cls-token head) on the same random weights.

NOTE: this is the SECONDARY parity check (it validates the timm *rename
table* specifically); the primary oracle is tests/test_reference_parity.py,
which executes the reference's own model code from /root/reference/src.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from myrtle_vision_tpu.models.vit import ViT  # noqa: E402
from myrtle_vision_tpu.utils.pretrained import (  # noqa: E402
    load_pretrained_backbone,
    rename_timm_state_dict,
)

DIM, DEPTH, HEADS, MLP = 64, 2, 2, 128
PATCH, IMG, NCLS = 16, 80, 5
GRID = IMG // PATCH


def make_timm_state_dict(seed=0):
    rng = np.random.RandomState(seed)

    def t(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    sd = {
        "cls_token": t(1, 1, DIM),
        "pos_embed": t(1, 14 * 14 + 1, DIM),
        "patch_embed.proj.weight": t(DIM, 3, PATCH, PATCH),
        "patch_embed.proj.bias": t(DIM),
        # classifier head + final norm: intentionally dropped by the import
        "norm.weight": t(DIM),
        "norm.bias": t(DIM),
        "head.weight": t(NCLS, DIM),
        "head.bias": t(NCLS),
    }
    for i in range(DEPTH):
        sd[f"blocks.{i}.norm1.weight"] = 1 + t(DIM)
        sd[f"blocks.{i}.norm1.bias"] = t(DIM)
        sd[f"blocks.{i}.attn.qkv.weight"] = t(3 * DIM, DIM)
        sd[f"blocks.{i}.attn.qkv.bias"] = t(3 * DIM)
        sd[f"blocks.{i}.attn.proj.weight"] = t(DIM, DIM)
        sd[f"blocks.{i}.attn.proj.bias"] = t(DIM)
        sd[f"blocks.{i}.norm2.weight"] = 1 + t(DIM)
        sd[f"blocks.{i}.norm2.bias"] = t(DIM)
        sd[f"blocks.{i}.mlp.fc1.weight"] = t(MLP, DIM)
        sd[f"blocks.{i}.mlp.fc1.bias"] = t(MLP)
        sd[f"blocks.{i}.mlp.fc2.weight"] = t(DIM, MLP)
        sd[f"blocks.{i}.mlp.fc2.bias"] = t(DIM)
    return sd


def torch_backbone_forward(sd, img_nchw, pos_embed):
    """Execute the reference ViT semantics in torch: patchify-as-reshape,
    linear patch embed, cls token, pos add, pre-norm blocks (exact GELU).
    Returns the token embeddings BEFORE any decoder (the imported part)."""
    x = torch.from_numpy(img_nchw)
    b, c, h, w = x.shape
    p = PATCH
    x = (
        x.reshape(b, c, h // p, p, w // p, p)
        .permute(0, 2, 4, 3, 5, 1)
        .reshape(b, (h // p) * (w // p), p * p * c)
    )
    w_pe = torch.from_numpy(sd["patch_embed.proj.weight"])
    w_pe = w_pe.permute(0, 2, 3, 1).reshape(DIM, p * p * c)
    x = x @ w_pe.T + torch.from_numpy(sd["patch_embed.proj.bias"])
    cls = torch.from_numpy(sd["cls_token"]).expand(b, 1, DIM)
    x = torch.cat([cls, x], dim=1)
    x = x + torch.from_numpy(pos_embed)

    def ln(x, wkey, bkey):
        return torch.nn.functional.layer_norm(
            x, (DIM,), torch.from_numpy(sd[wkey]),
            torch.from_numpy(sd[bkey]), eps=1e-5,
        )

    for i in range(DEPTH):
        y = ln(x, f"blocks.{i}.norm1.weight", f"blocks.{i}.norm1.bias")
        qkv = y @ torch.from_numpy(
            sd[f"blocks.{i}.attn.qkv.weight"]
        ).T + torch.from_numpy(sd[f"blocks.{i}.attn.qkv.bias"])
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, HEADS, DIM // HEADS).permute(
            2, 0, 3, 1, 4
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (DIM // HEADS) ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, DIM)
        out = out @ torch.from_numpy(
            sd[f"blocks.{i}.attn.proj.weight"]
        ).T + torch.from_numpy(sd[f"blocks.{i}.attn.proj.bias"])
        x = x + out
        y = ln(x, f"blocks.{i}.norm2.weight", f"blocks.{i}.norm2.bias")
        y = y @ torch.from_numpy(
            sd[f"blocks.{i}.mlp.fc1.weight"]
        ).T + torch.from_numpy(sd[f"blocks.{i}.mlp.fc1.bias"])
        y = torch.nn.functional.gelu(y)  # exact
        y = y @ torch.from_numpy(
            sd[f"blocks.{i}.mlp.fc2.weight"]
        ).T + torch.from_numpy(sd[f"blocks.{i}.mlp.fc2.bias"])
        x = x + y
    return x.numpy()


class TestTimmImport:
    def test_backbone_forward_parity(self):
        sd = make_timm_state_dict()
        model = ViT(
            decoder="classification",
            image_size=IMG,
            patch_size=PATCH,
            num_classes=NCLS,
            dim=DIM,
            depth=DEPTH,
            heads=HEADS,
            mlp_dim=MLP,
            dim_head=DIM // HEADS,
            dtype=jnp.float32,
        )
        rng = np.random.RandomState(1)
        img_nhwc = rng.rand(2, IMG, IMG, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img_nhwc))
        params = load_pretrained_backbone(variables["params"], sd_source(sd))

        # run our model but capture pre-decoder tokens via the transformer
        # output: apply the backbone pieces through the public forward with
        # an identity-equivalent check on logits instead; here we compare
        # the decoder input by using the classification decoder on BOTH
        # sides. For the torch side: decode with OUR (randomly initialized)
        # decoder params to isolate the backbone.
        tokens_torch = torch_backbone_forward(
            sd,
            img_nhwc.transpose(0, 3, 1, 2),
            interpolated_pos(sd["pos_embed"]),
        )

        # our decoder applied to torch tokens must equal our full forward
        dec_norm_scale = np.asarray(params["decoder"]["norm"]["scale"])
        dec_norm_bias = np.asarray(params["decoder"]["norm"]["bias"])
        dec_kernel = np.asarray(params["decoder"]["linear"]["kernel"])
        dec_bias = np.asarray(params["decoder"]["linear"]["bias"])
        cls_tok = tokens_torch[:, 0]
        mean = cls_tok.mean(-1, keepdims=True)
        var = ((cls_tok - mean) ** 2).mean(-1, keepdims=True)
        normed = (cls_tok - mean) / np.sqrt(var + 1e-5)
        normed = normed * dec_norm_scale + dec_norm_bias
        expected_logits = normed @ dec_kernel + dec_bias

        ours = np.asarray(
            model.apply({"params": params}, jnp.asarray(img_nhwc))
        )
        np.testing.assert_allclose(ours, expected_logits, rtol=2e-4,
                                   atol=2e-4)

    def test_unexpected_keys_rejected(self):
        sd = make_timm_state_dict()
        sd["blocks.0.attn.weird_extra.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ValueError, match="unexpected"):
            rename_timm_state_dict(sd)


def interpolated_pos(pos_embed):
    """Reference pos-embed handling at grid != 14: bicubic interpolation
    (here GRID=5) — use torch interpolate as the golden path
    (reference vit.py:292-302)."""
    pe = torch.from_numpy(pos_embed)
    cls, patches = pe[:, :1], pe[:, 1:]
    grid = patches.transpose(1, 2).reshape(1, DIM, 14, 14)
    grid = torch.nn.functional.interpolate(
        grid, size=(GRID, GRID), mode="bicubic", align_corners=False
    )
    patches = grid.reshape(1, DIM, GRID * GRID).transpose(1, 2)
    return torch.cat([cls, patches], dim=1).numpy()


def sd_source(sd):
    """Write the state dict to a .pth so the import goes through the real
    file-loading path."""
    import tempfile

    import torch as _torch

    f = tempfile.NamedTemporaryFile(suffix=".pth", delete=False)
    _torch.save({k: _torch.from_numpy(v) for k, v in sd.items()}, f.name)
    return f.name
