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


def resnet_apply_torch_sd(
    sd, images, arch: str = "resnet50", train: bool = False,
    bn_momentum: float = 0.1,
):
    """Forward from a RAW torch-layout state dict (OIHW convs, separate BN
    gamma/beta/running stats) — used by the finetuning CLI so checkpoints
    stay torch-compatible round-trip (classification/finetune_cnn.py).

    Eval mode (train=False): running statistics normalize (torch
    model.eval()); returns logits.
    Train mode: batch statistics normalize (differentiable through
    mean/var, torch model.train()) and the function also returns the
    EMA-updated running stats dict {name.running_mean/var} (torch
    momentum-0.1 update with unbiased batch variance).
    """
    new_stats = {}

    def conv(name, x, stride, pad):
        w = jnp.transpose(jnp.asarray(sd[f"{name}.weight"]), (2, 3, 1, 0))
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def bn(name, x):
        gamma = jnp.asarray(sd[f"{name}.weight"])
        beta = jnp.asarray(sd[f"{name}.bias"])
        if train:
            mu = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.mean(
                jnp.square(x - mu[None, None, None, :]), axis=(0, 1, 2)
            )
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * n / max(n - 1, 1)
            m = bn_momentum
            new_stats[f"{name}.running_mean"] = jax.lax.stop_gradient(
                (1 - m) * jnp.asarray(sd[f"{name}.running_mean"]) + m * mu
            )
            new_stats[f"{name}.running_var"] = jax.lax.stop_gradient(
                (1 - m) * jnp.asarray(sd[f"{name}.running_var"])
                + m * unbiased
            )
        else:
            mu = jnp.asarray(sd[f"{name}.running_mean"])
            var = jnp.asarray(sd[f"{name}.running_var"])
        return gamma * (x - mu) * jax.lax.rsqrt(var + 1e-5) + beta

    def basic(prefix, x, stride):
        identity = x
        out = jax.nn.relu(bn(f"{prefix}.bn1",
                             conv(f"{prefix}.conv1", x, stride, 1)))
        out = bn(f"{prefix}.bn2", conv(f"{prefix}.conv2", out, 1, 1))
        if f"{prefix}.downsample.0.weight" in sd:
            identity = bn(f"{prefix}.downsample.1",
                          conv(f"{prefix}.downsample.0", x, stride, 0))
        return jax.nn.relu(out + identity)

    def bottleneck(prefix, x, stride):
        identity = x
        out = jax.nn.relu(bn(f"{prefix}.bn1",
                             conv(f"{prefix}.conv1", x, 1, 0)))
        out = jax.nn.relu(bn(f"{prefix}.bn2",
                             conv(f"{prefix}.conv2", out, stride, 1)))
        out = bn(f"{prefix}.bn3", conv(f"{prefix}.conv3", out, 1, 0))
        if f"{prefix}.downsample.0.weight" in sd:
            identity = bn(f"{prefix}.downsample.1",
                          conv(f"{prefix}.downsample.0", x, stride, 0))
        return jax.nn.relu(out + identity)

    block_kind, layout = _ARCH[arch]
    block = basic if block_kind == "basic" else bottleneck

    x = jax.nn.relu(bn("bn1", conv("conv1", images, 2, 3)))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for li, blocks in enumerate(layout, start=1):
        for bi in range(blocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = block(f"layer{li}.{bi}", x, stride)
    x = jnp.mean(x, axis=(1, 2))
    logits = x @ jnp.asarray(sd["fc.weight"]).T + jnp.asarray(sd["fc.bias"])
    if train:
        return logits, new_stats
    return logits


def random_state_dict(arch: str, num_classes: int, seed: int = 0):
    """torchvision-layout random state dict (OIHW convs, BN buffers) — for
    tests and for initializing finetuning without downloaded weights."""
    rng = np.random.RandomState(seed)
    block_kind, layout = _ARCH[arch]
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = (
            rng.randn(o, i, k, k) * (2.0 / (i * k * k)) ** 0.5
        ).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)
        sd[f"{name}.num_batches_tracked"] = np.int64(0)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    widths = (64, 128, 256, 512)
    for li, (blocks, width) in enumerate(zip(layout, widths), start=1):
        out_ch = width * (4 if block_kind == "bottleneck" else 1)
        for bi in range(blocks):
            p = f"layer{li}.{bi}"
            if block_kind == "bottleneck":
                conv(f"{p}.conv1", width, in_ch, 1)
                bn(f"{p}.bn1", width)
                conv(f"{p}.conv2", width, width, 3)
                bn(f"{p}.bn2", width)
                conv(f"{p}.conv3", out_ch, width, 1)
                bn(f"{p}.bn3", out_ch)
            else:
                conv(f"{p}.conv1", width, in_ch, 3)
                bn(f"{p}.bn1", width)
                conv(f"{p}.conv2", width, width, 3)
                bn(f"{p}.bn2", width)
            if bi == 0 and (in_ch != out_ch or li > 1):
                conv(f"{p}.downsample.0", out_ch, in_ch, 1)
                bn(f"{p}.downsample.1", out_ch)
            in_ch = out_ch
    sd["fc.weight"] = (
        rng.randn(num_classes, in_ch) * in_ch ** -0.5
    ).astype(np.float32)
    sd["fc.bias"] = np.zeros(num_classes, np.float32)
    return sd
