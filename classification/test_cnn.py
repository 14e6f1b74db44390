#!/usr/bin/env python
"""CNN-baseline evaluation CLI (distillation-teacher sanity check).

Reference parity (reference: classification/test_cnn.py): evaluates a
finetuned torchvision CNN checkpoint on the RESISC45 val/test split and
prints a classification report.  The reference instantiates torchvision
models; here the networks run as pure JAX functions over the imported
torch state dict (models/resnet.py + models/cnn.py) — the notebook's full
zoo is supported: resnet18/resnet50, squeezenet1_0/1_1, mobilenet_v2,
mnasnet1_0, shufflenet_v2_x1_0 (reference utils/models.py:14-22,
Finetune_CNN_Resisc45.ipynb).

Usage: python test_cnn.py --model resnet50 --cnn_weights weights.pth
       [--use_val_set]
"""
import argparse
import os
import sys

# the sibling test.py provides the report/eval helpers
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.datasets.resisc45 import Resisc45
from myrtle_vision_tpu.models.cnn import ALL_CNN_ARCHS, apply_any_torch_sd
from myrtle_vision_tpu.utils.config import get_label_list, parse_config

from test import classification_report  # noqa: E402

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)

SUPPORTED = ALL_CNN_ARCHS


def test_cnn(model_name, cnn_weights, use_val_set=False,
             data_config_path="data_configs/data_config.json"):
    if model_name not in SUPPORTED:
        raise SystemExit(
            f"unsupported model {model_name!r}; supported: {SUPPORTED}"
        )
    data_config = parse_config(data_config_path)
    dataset_path = data_config["dataset_path"]
    label_map_path = data_config["label_map"]
    imagepaths = (
        data_config["valid_files"] if use_val_set
        else data_config["test_files"]
    )

    evalset = Resisc45(
        mode="eval",
        dataset_path=dataset_path,
        imagepaths=imagepaths,
        label_map_path=label_map_path,
        transform_config=data_config["transform_ops_val"],
    )
    eval_loader = DataLoader(evalset, batch_size=32, drop_last=False)

    import torch

    sd = torch.load(cnn_weights, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = {
        k: jnp.asarray(np.asarray(v)) for k, v in sd.items()
        if not k.endswith("num_batches_tracked")
    }

    @jax.jit
    def forward(images):
        return apply_any_torch_sd(params, images, model_name)

    gts, preds = [], []
    for batch in eval_loader.epoch(0):
        logits = forward(jnp.asarray(batch["image"]))
        preds.extend(np.asarray(jnp.argmax(logits, -1)))
        gts.extend(batch["label"])

    print(
        classification_report(
            np.asarray(gts),
            np.asarray(preds),
            data_config["number_of_classes"],
            get_label_list(dataset_path, label_map_path),
        )
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--model",
        type=str,
        default="resnet50",
        help=f"CNN architecture, one of {SUPPORTED}",
    )
    parser.add_argument(
        "--cnn_weights",
        type=str,
        required=True,
        help="Path to the pretrained weights of the CNN model (.pth file)",
    )
    parser.add_argument(
        "--use_val_set",
        action="store_true",
        help="Evaluate on the validation split instead of test",
    )
    parser.add_argument(
        "--data_config",
        type=str,
        default="data_configs/data_config.json",
    )
    args = parser.parse_args()
    test_cnn(args.model, args.cnn_weights, args.use_val_set,
             args.data_config)
