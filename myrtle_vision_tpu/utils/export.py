"""Checkpoint export to the reference's torch state-dict format.

The reference's checkpoints are the FPGA deployment handoff format
(reference: classification/README.md:31-33, utils/models.py:113-126 —
torch.save of the ViT module state dict).  This exporter maps a trained
param tree onto the reference's exact module naming (reference
src/myrtle_vision/models/vit.py structure: ``transformer.layers.N.0.fn.fn
.to_qkv.weight`` etc.) so weights trained here load directly into the
reference stack / its FPGA toolchain, and vice versa via
``import_torch_state_dict``.

Layout conversions: flax kernels (in, out) <-> torch weights (out, in);
the patch embedding stays a Linear on both sides (the reference also uses
a Linear patch embed, vit.py:220).
"""
from __future__ import annotations

import numpy as np

# (our path, reference name template, is_linear_kernel)
_BACKBONE = [
    (("pos_embedding",), "pos_embedding", False),
    (("pos_embedding_det",), "pos_embedding_det", False),
    (("cls_token",), "cls_token", False),
    (("det_tokens",), "det_tokens", False),
    (("patch_to_embedding", "kernel"), "patch_to_embedding.weight", True),
    (("patch_to_embedding", "bias"), "patch_to_embedding.bias", False),
]

_LAYER = [
    (("attn_norm", "scale"), "transformer.layers.{i}.0.fn.norm.weight",
     False),
    (("attn_norm", "bias"), "transformer.layers.{i}.0.fn.norm.bias", False),
    (("attn", "to_qkv", "kernel"),
     "transformer.layers.{i}.0.fn.fn.to_qkv.weight", True),
    (("attn", "to_qkv", "bias"),
     "transformer.layers.{i}.0.fn.fn.to_qkv.bias", False),
    (("attn", "to_out", "kernel"),
     "transformer.layers.{i}.0.fn.fn.to_out.0.weight", True),
    (("attn", "to_out", "bias"),
     "transformer.layers.{i}.0.fn.fn.to_out.0.bias", False),
    (("ffn_norm", "scale"), "transformer.layers.{i}.1.fn.norm.weight",
     False),
    (("ffn_norm", "bias"), "transformer.layers.{i}.1.fn.norm.bias", False),
    (("ffn", "fc1", "kernel"),
     "transformer.layers.{i}.1.fn.fn.net.0.weight", True),
    (("ffn", "fc1", "bias"),
     "transformer.layers.{i}.1.fn.fn.net.0.bias", False),
    (("ffn", "fc2", "kernel"),
     "transformer.layers.{i}.1.fn.fn.net.3.weight", True),
    (("ffn", "fc2", "bias"),
     "transformer.layers.{i}.1.fn.fn.net.3.bias", False),
]

_DECODER = {
    "classification": [
        (("decoder", "norm", "scale"), "decoder.norm.weight", False),
        (("decoder", "norm", "bias"), "decoder.norm.bias", False),
        (("decoder", "linear", "kernel"), "decoder.linear.weight", True),
        (("decoder", "linear", "bias"), "decoder.linear.bias", False),
    ],
    "segmentation": [
        (("decoder", "norm", "scale"), "decoder.norm.weight", False),
        (("decoder", "norm", "bias"), "decoder.norm.bias", False),
        (("decoder", "linear", "kernel"), "decoder.linear.weight", True),
        (("decoder", "linear", "bias"), "decoder.linear.bias", False),
    ],
    "detection": [
        (("decoder", "class_embed", "kernel"),
         "decoder.class_embed.weight", True),
        (("decoder", "class_embed", "bias"),
         "decoder.class_embed.bias", False),
        (("decoder", "bbox_embed", "kernel"),
         "decoder.bbox_embed.weight", True),
        (("decoder", "bbox_embed", "bias"),
         "decoder.bbox_embed.bias", False),
    ],
}


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _rules(params, decoder: str):
    depth = len(
        [k for k in params["transformer"] if k.startswith("layers_")]
    )
    rules = list(_BACKBONE)
    for i in range(depth):
        for path, name, is_kernel in _LAYER:
            rules.append(
                (("transformer", f"layers_{i}") + path, name.format(i=i),
                 is_kernel)
            )
    rules += _DECODER[decoder]
    return rules


def _qat_name(name: str) -> str:
    """Reference module name -> its QAT-prepared name.

    The reference's prepare_qat for the stateless float formats wraps
    every Linear/LayerNorm in Sequential(activation_pre_process, module)
    (reference quantize.py:253-327), so each module parameter gains one
    ``.1`` path component: ``patch_to_embedding.weight`` ->
    ``patch_to_embedding.1.weight``.  Token parameters (pos_embedding,
    cls_token, ...) are unaffected."""
    for suffix in (".weight", ".bias"):
        if name.endswith(suffix):
            return name[: -len(suffix)] + ".1" + suffix
    return name


def export_torch_state_dict(params, decoder: str,
                            qat_wrapped: bool = False) -> dict:
    """Param tree -> {reference torch name: numpy array}.

    ``qat_wrapped``: emit the QAT-prepared module names (see _qat_name)
    so the checkpoint loads into a reference model constructed with a
    stateless q_format (its prepare_qat runs at construction,
    vit.py:262-265)."""
    sd = {}
    for path, name, is_kernel in _rules(params, decoder):
        # copy=True: torch.from_numpy warns on the non-writable buffers
        # jax device arrays expose
        arr = np.array(_get(params, path), np.float32, copy=True)
        if is_kernel:
            arr = np.ascontiguousarray(arr.T)  # flax (in,out)->torch (out,in)
        sd[_qat_name(name) if qat_wrapped else name] = arr
    return sd


def save_torch_checkpoint(params, decoder: str, filepath: str,
                          qat_wrapped: bool = False):
    """torch.save the exported state dict (the reference/FPGA handoff
    format)."""
    import torch

    sd = export_torch_state_dict(params, decoder, qat_wrapped=qat_wrapped)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, filepath)


def import_torch_state_dict(params, state_dict, decoder: str):
    """Reference-format torch state dict -> merged param tree (inverse of
    export; unknown keys are ignored — the reference model carries extra
    quantizer buffers in some formats).  Accepts both plain and
    QAT-prepared module naming (see _qat_name) and raises if fewer than
    half the expected parameters were found (an unrecognized layout
    would otherwise silently produce a near-init model)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def set_(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        old = node[path[-1]]
        assert tuple(old.shape) == tuple(value.shape), (
            f"{path}: {old.shape} vs {value.shape}"
        )
        node[path[-1]] = value.astype(np.float32)

    import jax

    merged = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    rules = _rules(params, decoder)
    found = 0
    for path, name, is_kernel in rules:
        if name not in sd:
            name = _qat_name(name)  # QAT-prepared checkpoint naming
        if name not in sd:
            continue
        found += 1
        arr = sd[name]
        if is_kernel:
            arr = arr.T
        set_(merged, path, arr)
    if found * 2 < len(rules):
        raise ValueError(
            f"only {found}/{len(rules)} expected parameters found in the "
            "torch state dict — unrecognized checkpoint layout"
        )
    return merged
