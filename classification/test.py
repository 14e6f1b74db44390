#!/usr/bin/env python
"""RESISC45 classification evaluation CLI.

Reference parity: ``python test.py -c <config.json>`` evaluates the
checkpoint named in ``train_config.checkpoint_path`` on the test split and
prints a per-class precision/recall/F1 report
(reference: classification/test.py).
"""
import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.datasets.resisc45 import Resisc45
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.classification import make_predict_fn
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import prepare_model_and_load_ckpt
from myrtle_vision_tpu.utils.config import get_label_list, parse_config

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)


def evaluate_dataset(predict_fn, state, loader):
    """Collect (ground truth, prediction) label arrays over a dataset."""
    gts, preds = [], []
    for batch in loader.epoch(0):
        n = int(batch.pop("_n_valid", len(batch["label"])))
        logits = predict_fn(
            state.params, state.quant, jnp.asarray(batch["image"])
        )
        preds.extend(np.asarray(jnp.argmax(logits, -1))[:n])
        gts.extend(batch["label"][:n])
    return np.asarray(gts), np.asarray(preds)


def classification_report(gts, preds, num_classes, target_names):
    """Per-class P/R/F1 report; uses sklearn when present, falls back to a
    numpy implementation (same numbers)."""
    try:
        from sklearn.metrics import classification_report as skl_report

        return skl_report(
            gts, preds, labels=np.arange(num_classes),
            target_names=target_names, zero_division=0,
        )
    except ImportError:
        lines = [f"{'':>25} {'precision':>9} {'recall':>9} {'f1':>9} "
                 f"{'support':>9}"]
        for c, name in enumerate(target_names):
            tp = np.sum((preds == c) & (gts == c))
            fp = np.sum((preds == c) & (gts != c))
            fn = np.sum((preds != c) & (gts == c))
            p = tp / max(tp + fp, 1)
            r = tp / max(tp + fn, 1)
            f1 = 2 * p * r / max(p + r, 1e-12)
            lines.append(
                f"{name:>25} {p:9.2f} {r:9.2f} {f1:9.2f} "
                f"{int(np.sum(gts == c)):9d}"
            )
        acc = float(np.mean(gts == preds))
        lines.append(f"\n{'accuracy':>25} {acc:29.2f}")
        return "\n".join(lines)


def test_deit(config):
    train_config = config["train_config"]
    data_config = parse_config(config["data_config_path"])
    dataset_path = data_config["dataset_path"]
    label_map_path = data_config["label_map"]

    testset = Resisc45(
        mode="eval",
        dataset_path=dataset_path,
        imagepaths=data_config["test_files"],
        label_map_path=label_map_path,
        transform_config=data_config["transform_ops_val"],
    )
    test_loader = DataLoader(
        testset,
        batch_size=train_config["local_batch_size"],
        drop_last=train_config["drop_last_batch"],
        pad_last=True,
    )

    # dropout removed for eval (reference test.py:47-49)
    config["vit_config"]["dropout"] = 0.0
    config["vit_config"]["emb_dropout"] = 0.0
    vit = ViT(**vit_kwargs_from_config(config, data_config))

    assert (
        train_config["checkpoint_path"] != ""
    ), "Must provide a checkpoint path in the config file"
    tx = create_optimizer(train_config)
    sample = jnp.zeros((1, vit.image_size, vit.image_size, 3))
    state = init_train_state(vit, tx, jax.random.PRNGKey(0), sample)
    state, _ = prepare_model_and_load_ckpt(
        train_config, state, restore_optimizer=False
    )

    predict_fn = make_predict_fn(vit)
    gts, preds = evaluate_dataset(predict_fn, state, test_loader)

    print(
        classification_report(
            gts,
            preds,
            data_config["number_of_classes"],
            get_label_list(dataset_path, label_map_path),
        )
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c", "--config", type=str, help="JSON file for configuration"
    )
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.loads(f.read())

    test_deit(config)
