#!/usr/bin/env python
"""Attention-map visualization CLI.

The reference exposes an ``attn_output`` identity hook for attention-map
extraction (reference vit.py:82,94); this CLI is the user surface for the
equivalent capture path here (``capture_attention=True`` sows each layer's
softmax probabilities into the ``intermediates`` collection):

    python visualize_attention.py -c <config.json> --image img.jpg \
        --output_dir attn/ [--layer -1]

Writes, for the chosen layer, one grayscale PNG per head showing the CLS
token's attention over the patch grid (upsampled to the input size), plus
the head-mean map.
"""
import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import prepare_model_and_load_ckpt
from myrtle_vision_tpu.utils.config import parse_config
from myrtle_vision_tpu.transforms.classification import (
    transform_from_config,
)

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)


def visualize(config, image_path, output_dir, layer=-1):
    train_config = config["train_config"]
    data_config = parse_config(config["data_config_path"])
    vit = ViT(**vit_kwargs_from_config(config, data_config))

    assert (
        train_config["checkpoint_path"] != ""
    ), "Must provide a checkpoint path in the config file"
    tx = create_optimizer(train_config)
    state = init_train_state(
        vit, tx, jax.random.PRNGKey(0),
        jnp.zeros((1, vit.image_size, vit.image_size, 3)),
    )
    state, _ = prepare_model_and_load_ckpt(
        train_config, state, restore_optimizer=False
    )

    transform = transform_from_config(data_config["transform_ops_val"])
    img = transform(Image.open(image_path).convert("RGB"),
                    np.random.default_rng(0))
    batch = jnp.asarray(img)[None]

    _, inter = vit.apply(
        {"params": state.params, **({"quant": state.quant}
                                    if state.quant else {})},
        batch, deterministic=True, capture_attention=True,
        mutable=["intermediates"],
    )
    # one (1, heads, n, n) entry per transformer layer, in depth order
    maps = jax.tree_util.tree_leaves(inter["intermediates"])
    probs = np.asarray(maps[layer])[0]  # (heads, n, n)

    grid = vit.image_size // vit.patch_size
    n_prefix = 1  # CLS token leads the sequence
    cls_attn = probs[:, 0, n_prefix : n_prefix + grid * grid]
    os.makedirs(output_dir, exist_ok=True)

    def save(name, attn_1d):
        a = attn_1d.reshape(grid, grid)
        a = (a - a.min()) / max(a.max() - a.min(), 1e-12)
        im = Image.fromarray((a * 255).astype(np.uint8), "L")
        im = im.resize((vit.image_size, vit.image_size), Image.BILINEAR)
        im.save(os.path.join(output_dir, name))

    for h in range(cls_attn.shape[0]):
        save(f"layer{layer}_head{h}.png", cls_attn[h])
    save(f"layer{layer}_mean.png", cls_attn.mean(0))
    print(
        f"wrote {cls_attn.shape[0] + 1} attention maps "
        f"(layer {layer}, {cls_attn.shape[0]} heads + mean) to {output_dir}"
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c", "--config", type=str, help="JSON file for configuration"
    )
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument(
        "--layer", type=int, default=-1,
        help="transformer layer to visualize (default: last)",
    )
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.loads(f.read())
    visualize(config, args.image, args.output_dir, args.layer)
