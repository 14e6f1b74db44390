#!/usr/bin/env python
"""Import a reference-format torch checkpoint into a framework checkpoint.

Inverse of export_checkpoint.py: reads a torch .pth in the reference's
module naming — either a raw state dict (the FPGA handoff format) or the
training-checkpoint envelope {"model": ..., "iteration": ...}
(reference utils/models.py:113-141) — and writes a framework checkpoint
loadable via ``train_config.checkpoint_path``:

    python import_checkpoint.py -c <config.json> \
        --torch_ckpt reference.pth --output imported.ckpt

Used by the BASELINE.md accuracy-parity measurements to evaluate the
reference control run's trained weights through THIS stack.
"""
import argparse
import json
import os

import jax
import jax.numpy as jnp

from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import save_checkpoint
from myrtle_vision_tpu.utils.config import parse_config
from myrtle_vision_tpu.utils.export import import_torch_state_dict

if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])


def main(config, torch_ckpt, output):
    import torch

    data_config = parse_config(config["data_config_path"])
    vit = ViT(**vit_kwargs_from_config(config, data_config))
    tx = create_optimizer(config["train_config"])
    state = init_train_state(
        vit, tx, jax.random.PRNGKey(0),
        jnp.zeros((1, vit.image_size, vit.image_size, 3)),
    )

    payload = torch.load(torch_ckpt, map_location="cpu", weights_only=True)
    iteration = 0
    if isinstance(payload, dict) and "model" in payload:
        iteration = int(payload.get("iteration", 0))
        payload = payload["model"]
    sd = {k: v.numpy() for k, v in payload.items()}
    params = import_torch_state_dict(state.params, sd, vit.decoder)
    state = state.replace(
        params=params, iteration=jnp.asarray(iteration, jnp.int32)
    )
    save_checkpoint(state, output, include_optimizer=False)
    print(
        f"imported {torch_ckpt} (iteration {iteration}) -> {output} "
        f"(decoder={vit.decoder})"
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c", "--config", type=str, help="JSON file for configuration"
    )
    parser.add_argument("--torch_ckpt", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.loads(f.read())
    main(config, args.torch_ckpt, args.output)
