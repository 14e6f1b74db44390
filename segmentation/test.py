#!/usr/bin/env python
"""DLRSD segmentation evaluation CLI: mIoU + per-class IoU.

Reference parity: ``python test.py -c <config.json>``
(reference: segmentation/test.py:79-88 prints overall mIoU and per-class
IoU using the class names from the label map).

``--visualize_dir DIR [--visualize_n N]`` additionally writes the first N
predictions as RGB PNGs colorized with the DLRSD palette (reference
utils/colors.py).
"""
import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.datasets.dlrsd import Dlrsd
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.classification import make_predict_fn
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import prepare_model_and_load_ckpt
from myrtle_vision_tpu.utils.config import get_label_list, parse_config
from myrtle_vision_tpu.utils.metrics import MIoU

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)


def test_seg(config, visualize_dir=None, visualize_n=8):
    train_config = config["train_config"]
    data_config = parse_config(config["data_config_path"])
    n_classes = data_config["number_of_classes"]

    testset = Dlrsd(
        mode="test",
        dataset_path=data_config["dataset_path"],
        imagepaths=data_config["test_files"],
        label_map_path=data_config["label_map"],
        transform_config=data_config["transform_ops_val"],
    )
    test_loader = DataLoader(
        testset,
        batch_size=train_config["local_batch_size"],
        drop_last=train_config["drop_last_batch"],
        pad_last=True,
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

    predict_fn = make_predict_fn(vit)
    miou = MIoU(num_classes=n_classes)
    n_written = 0
    for batch in test_loader.epoch(0):
        n = int(batch.pop("_n_valid", len(batch["label"])))
        logits = predict_fn(
            state.params, state.quant, jnp.asarray(batch["image"])
        )
        preds = np.asarray(jnp.argmax(logits, -1))[:n]
        batch["label"] = batch["label"][:n]
        miou.add_batch(preds, batch["label"])
        if visualize_dir is not None and n_written < visualize_n:
            from PIL import Image

            from myrtle_vision_tpu.utils.colors import colorize_mask

            os.makedirs(visualize_dir, exist_ok=True)
            for pred, label in zip(preds, batch["label"]):
                if n_written >= visualize_n:
                    break
                Image.fromarray(colorize_mask(pred)).save(
                    os.path.join(visualize_dir, f"pred_{n_written}.png")
                )
                Image.fromarray(colorize_mask(label)).save(
                    os.path.join(visualize_dir, f"label_{n_written}.png")
                )
                n_written += 1

    label_list = get_label_list(
        data_config["dataset_path"], data_config["label_map"]
    )
    per_class = miou.get_per_class_iou()
    print(f"mIoU: {miou.get_miou():.4f}")
    for name, iou in zip(label_list, per_class):
        print(f"  {name:>15}: {iou:.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c", "--config", type=str, help="JSON file for configuration"
    )
    parser.add_argument(
        "--visualize_dir", type=str, default=None,
        help="write colorized prediction/label PNGs here",
    )
    parser.add_argument("--visualize_n", type=int, default=8)
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.loads(f.read())

    test_seg(config, args.visualize_dir, args.visualize_n)
