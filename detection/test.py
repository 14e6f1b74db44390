#!/usr/bin/env python
"""DIOR detection evaluation CLI: COCO mAP.

Reference parity: ``python test.py -c <config.json>``
(reference: detection/test.py:58-73 evaluates the checkpoint on the test
split via PostProcess + CocoEvaluator and prints the 12-number summary).
"""
import argparse
import json
import os

import jax
import jax.numpy as jnp

from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.datasets.coco import CocoDetection
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.detection import (
    evaluate_coco,
    make_detect_fn,
)
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.transforms import detection as T
from myrtle_vision_tpu.utils.checkpoint import prepare_model_and_load_ckpt
from myrtle_vision_tpu.utils.config import parse_config

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)


def test_detection(config):
    train_config = config["train_config"]
    vit_config = config["vit_config"]
    data_config = parse_config(config["data_config_path"])
    num_det_tokens = vit_config.get("num_det_tokens", 100)
    dataset_path = data_config["dataset_path"]

    testset = CocoDetection(
        os.path.join(dataset_path, data_config["test_images"]),
        os.path.join(dataset_path, "annotations", data_config["test_annotations"]),
        T.from_config(data_config["transform_ops_val"]),
        subset=data_config.get("test_subset"),
    )
    test_loader = DataLoader(
        testset,
        batch_size=train_config["local_batch_size"],
        drop_last=False,
        collate_fn=lambda items: T.collate_detection(
            items, max_boxes=num_det_tokens
        ),
    )

    config["vit_config"]["dropout"] = 0.0
    config["vit_config"]["emb_dropout"] = 0.0
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

    detect_fn = make_detect_fn(vit)
    evaluate_coco(detect_fn, state, test_loader, testset.coco)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c", "--config", type=str, help="JSON file for configuration"
    )
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.loads(f.read())

    test_detection(config)
