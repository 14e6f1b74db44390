"""Exact test-split top-1 (correct/total) for one of OUR checkpoints.

Usage:
    MVT_PLATFORM=cpu python tools/refcontrol/exact_test_acc.py \
        <train_config.json> <checkpoint_path>

Prints ``correct/total = pct`` with full precision — the classification
report CLI rounds to 2 decimals, which is too coarse for BASELINE rows.
Evaluates exactly like classification/test.py (fp32 eval numerics,
test-split val transforms, batch 64).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax

if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.utils.config import parse_config
from myrtle_vision_tpu.datasets.resisc45 import Resisc45
from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import (
    prepare_model_and_load_ckpt,
)


def main(cfg_path, ckpt):
    cfg = json.load(open(cfg_path))
    cfg["train_config"]["checkpoint_path"] = ckpt
    data_config = parse_config(cfg["data_config_path"])
    testset = Resisc45(
        mode="eval", dataset_path=data_config["dataset_path"],
        imagepaths=data_config["test_files"],
        label_map_path=data_config["label_map"],
        transform_config=data_config["transform_ops_val"],
    )
    loader = DataLoader(
        testset, batch_size=64,
        drop_last=cfg["train_config"]["drop_last_batch"],
    )
    kwargs = vit_kwargs_from_config(cfg, data_config)
    kwargs["dtype"] = jnp.float32
    vit = ViT(**kwargs)
    tx = create_optimizer(cfg["train_config"])
    state = init_train_state(
        vit, tx, jax.random.PRNGKey(0),
        jnp.zeros((1, vit.image_size, vit.image_size, 3)))
    state, _ = prepare_model_and_load_ckpt(
        cfg["train_config"], state, restore_optimizer=False)

    extra = {"quant": state.quant} if state.quant else {}

    @jax.jit
    def fwd(params, images):
        return vit.apply(
            {"params": params, **extra}, images, deterministic=True)

    correct = total = 0
    for batch in loader.epoch(0):
        logits = fwd(state.params, batch["image"])
        pred = np.asarray(jnp.argmax(logits, -1))
        correct += int((pred == np.asarray(batch["label"])).sum())
        total += len(pred)
    print(f"{ckpt}: {correct}/{total} = {100.0 * correct / total:.4f}%")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
