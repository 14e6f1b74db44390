"""Inference-mode ResNet (torchvision-compatible) for the distillation
teacher and CNN-baseline evaluation.

The reference's teacher is a finetuned torchvision resnet50 loaded from a
.pth file, frozen and eval()'d (reference: src/myrtle_vision/utils/models.py:
14-22); its CNN-baseline eval CLI covers more torchvision models
(classification/test_cnn.py).  Here the network is a pure jittable function
over a parameter dict imported from a torch state dict — there is no
training mode, so batch-norm statistics are folded into per-channel
scale/shift at load time (faster than normalizing at runtime) and inputs
are NHWC (TPU layout; torch conv weights are permuted OIHW -> HWIO on
import).

Supported archs: resnet18 (BasicBlock [2,2,2,2]) and resnet50
(Bottleneck [3,4,6,3]); torchvision v1.5-style strides (stride on the 3x3
conv of Bottleneck).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_ARCH = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
}


def load_torch_resnet(source, arch: str = "resnet50"):
    """Convert a torchvision ResNet state dict (path or dict) into a flat
    {name: array} dict with HWIO convs and folded BN scale/shift."""
    if isinstance(source, str):
        import torch

        sd = torch.load(source, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in source.items()}

    out = {}
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        out[key] = np.asarray(value, np.float32)

    params = {}
    for key in list(out):
        if key.endswith(".running_mean"):
            prefix = key[: -len(".running_mean")]
            gamma = out[f"{prefix}.weight"]
            beta = out[f"{prefix}.bias"]
            mean = out[f"{prefix}.running_mean"]
            var = out[f"{prefix}.running_var"]
            scale = gamma / np.sqrt(var + 1e-5)
            params[f"{prefix}.scale"] = scale.astype(np.float32)
            params[f"{prefix}.shift"] = (beta - mean * scale).astype(
                np.float32
            )
    for key, value in out.items():
        prefix = key.rsplit(".", 1)[0]
        if f"{prefix}.running_mean" in out:
            continue  # BN param, already folded
        if value.ndim == 4:  # conv OIHW -> HWIO
            params[key] = np.transpose(value, (2, 3, 1, 0))
        else:
            params[key] = value
    return params


def _conv(p, name, x, stride=1, padding=0):
    w = p[f"{name}.weight"]
    return jax.lax.conv_general_dilated(
        x,
        jnp.asarray(w),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, name, x):
    return x * jnp.asarray(p[f"{name}.scale"]) + jnp.asarray(
        p[f"{name}.shift"]
    )


def _basic_block(p, prefix, x, stride):
    identity = x
    out = jax.nn.relu(_bn(p, f"{prefix}.bn1",
                          _conv(p, f"{prefix}.conv1", x, stride, 1)))
    out = _bn(p, f"{prefix}.bn2", _conv(p, f"{prefix}.conv2", out, 1, 1))
    if f"{prefix}.downsample.0.weight" in p:
        identity = _bn(
            p,
            f"{prefix}.downsample.1",
            _conv(p, f"{prefix}.downsample.0", x, stride, 0),
        )
    return jax.nn.relu(out + identity)


def _bottleneck_block(p, prefix, x, stride):
    identity = x
    out = jax.nn.relu(_bn(p, f"{prefix}.bn1",
                          _conv(p, f"{prefix}.conv1", x, 1, 0)))
    out = jax.nn.relu(_bn(p, f"{prefix}.bn2",
                          _conv(p, f"{prefix}.conv2", out, stride, 1)))
    out = _bn(p, f"{prefix}.bn3", _conv(p, f"{prefix}.conv3", out, 1, 0))
    if f"{prefix}.downsample.0.weight" in p:
        identity = _bn(
            p,
            f"{prefix}.downsample.1",
            _conv(p, f"{prefix}.downsample.0", x, stride, 0),
        )
    return jax.nn.relu(out + identity)


def resnet_apply(params, images, arch: str = "resnet50"):
    """(B, H, W, 3) NHWC float images -> (B, num_classes) logits."""
    block_kind, layout = _ARCH[arch]
    block = _basic_block if block_kind == "basic" else _bottleneck_block

    x = jax.nn.relu(
        _bn(params, "bn1", _conv(params, "conv1", images, 2, 3))
    )
    # maxpool 3x3 stride 2 pad 1
    x = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for layer_idx, blocks in enumerate(layout, start=1):
        for block_idx in range(blocks):
            stride = 2 if (layer_idx > 1 and block_idx == 0) else 1
            x = block(params, f"layer{layer_idx}.{block_idx}", x, stride)
    x = jnp.mean(x, axis=(1, 2))
    w = jnp.asarray(params["fc.weight"])  # torch (out, in)
    b = jnp.asarray(params["fc.bias"])
    return x @ w.T + b


def make_teacher_fn(weights_path: str, arch: str = "resnet50"):
    """Frozen-teacher logits fn (reference utils/models.py:14-22)."""
    params = load_torch_resnet(weights_path, arch)
    return functools.partial(resnet_apply, params, arch=arch)
