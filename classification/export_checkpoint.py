#!/usr/bin/env python
"""Export a trained checkpoint to the reference torch state-dict format.

The reference's torch checkpoints are its FPGA deployment handoff format
(reference: classification/README.md:31-33); this CLI converts a
framework checkpoint (``train_config.checkpoint_path``) into a .pth with
the reference's exact module naming, loadable by the reference stack /
FPGA toolchain:

    python export_checkpoint.py -c <config.json> --output model.pth

Works for any of the three decoders (use the matching task config).
"""
import argparse
import json
import os

import jax
import jax.numpy as jnp

from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import prepare_model_and_load_ckpt
from myrtle_vision_tpu.utils.config import parse_config
from myrtle_vision_tpu.utils.export import save_torch_checkpoint

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])


def export(config, output, wrap_train_ckpt=False):
    train_config = config["train_config"]
    data_config = parse_config(config["data_config_path"])
    vit = ViT(**vit_kwargs_from_config(config, data_config))

    assert (
        train_config["checkpoint_path"] != ""
    ), "Must provide a checkpoint path in the config file"
    if "distiller_config" in config:
        # distillation training checkpoints hold the DistillWrapper tree
        # {student, distillation_token, distill_mlp}; the reference's
        # distill runs save only the student's state dict
        # (classification/train.py:210-217 saves model=vit), so export the
        # student subtree — param names below "student" are the plain ViT
        # layout
        from flax import serialization

        with open(train_config["checkpoint_path"], "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        state = type("S", (), {})()
        state.params = payload["model"]["student"]
        iteration = int(payload["iteration"])
    else:
        tx = create_optimizer(train_config)
        state = init_train_state(
            vit, tx, jax.random.PRNGKey(0),
            jnp.zeros((1, vit.image_size, vit.image_size, 3)),
        )
        state, iteration = prepare_model_and_load_ckpt(
            train_config, state, restore_optimizer=False
        )
    # stateless QAT formats: the reference's prepare_qat (run at model
    # construction) wraps each Linear/LayerNorm in
    # Sequential(stub, module), so its state-dict names carry an extra
    # '.1' — emit that naming so the checkpoint loads into a reference
    # model built with the same q_format (utils/export.py:_qat_name)
    qat_wrapped = vit.q_format.name in ("FP16_16", "FP16_32", "TF32")
    if wrap_train_ckpt:
        # the reference's training-checkpoint envelope
        # (utils/models.py:113-141): load_checkpoint reads ckpt["model"]
        # and ckpt["iteration"], so the exported file feeds the reference
        # eval CLIs directly via their checkpoint_path
        import torch

        from myrtle_vision_tpu.utils.export import export_torch_state_dict

        sd = {
            k: torch.from_numpy(v)
            for k, v in export_torch_state_dict(
                state.params, vit.decoder, qat_wrapped=qat_wrapped
            ).items()
        }
        torch.save({"model": sd, "iteration": iteration}, output)
    else:
        save_torch_checkpoint(state.params, vit.decoder, output,
                              qat_wrapped=qat_wrapped)
    print(f"exported {train_config['checkpoint_path']} -> {output} "
          f"(reference torch format, decoder={vit.decoder})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c", "--config", type=str, help="JSON file for configuration"
    )
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument(
        "--wrap_train_ckpt",
        action="store_true",
        help="Wrap in the reference's {model, iteration} training-checkpoint"
        " envelope so the reference train/test CLIs load it directly",
    )
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.loads(f.read())
    export(config, args.output, args.wrap_train_ckpt)
