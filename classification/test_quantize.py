#!/usr/bin/env python
"""PTQ / QAT quantized evaluation CLI.

Reference parity (reference: classification/test_quantize.py):
``python test_quantize.py -c <config.json> [--calib_steps N]
[--quantized_ckpt]``.

Flow (reference test_quantize.py:37-134):
  1. load checkpoint — with ``--quantized_ckpt`` the config's q_format was
     already active during training (QAT); otherwise the checkpoint is fp32
     and the target format is applied afterwards (PTQ);
  2. run N calibration batches from the validation split feeding the INT8
     min/max observers (a no-op for the stateless float formats);
  3. convert: bake weight fake-quant into the params;
  4. report serialized model size before/after and evaluate on the test
     split with a classification report.
"""
import argparse
import json
import os
import sys

# the sibling test.py provides the report/eval helpers
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.datasets.resisc45 import Resisc45
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.quantize import QFormat, convert_params, model_size_mb
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import (
    prepare_model_and_load_ckpt,
    save_checkpoint,
)
from myrtle_vision_tpu.utils.config import get_label_list, parse_config

from test import classification_report, evaluate_dataset  # noqa: E402

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)


def calibrate(model, state, val_loader, calib_steps):
    """Feed N batches through the model with observers recording
    (reference test_quantize.py:26-34)."""
    print(f"\nRunning {calib_steps} calibration steps")
    quant = state.quant

    @jax.jit
    def calib_step(params, quant, images):
        variables = {"params": params}
        if quant:
            variables["quant"] = quant
        _, upd = model.apply(
            variables, images, calibrating=True, mutable=["quant"]
        )
        return upd.get("quant", quant)

    for i, batch in enumerate(val_loader.epoch(0)):
        if i >= calib_steps:
            break
        quant = calib_step(state.params, quant, jnp.asarray(batch["image"]))
    return state.replace(quant=quant)


def test_deit(config, calib_steps, quantized_ckpt, save_converted=None):
    train_config = config["train_config"]
    data_config = parse_config(config["data_config_path"])
    dataset_path = data_config["dataset_path"]
    label_map_path = data_config["label_map"]
    q_format = QFormat[config["vit_config"]["q_format"]]

    loader_kwargs = dict(
        batch_size=train_config["local_batch_size"],
        drop_last=train_config["drop_last_batch"],
    )
    valset = Resisc45(
        mode="eval",
        dataset_path=dataset_path,
        imagepaths=data_config["valid_files"],
        label_map_path=label_map_path,
        transform_config=data_config["transform_ops_val"],
    )
    testset = Resisc45(
        mode="eval",
        dataset_path=dataset_path,
        imagepaths=data_config["test_files"],
        label_map_path=label_map_path,
        transform_config=data_config["transform_ops_val"],
    )
    # calibration keeps exact reference batch semantics (no padding); the
    # test loader pads the ragged tail so eval compiles one shape
    val_loader = DataLoader(valset, **loader_kwargs)
    test_loader = DataLoader(testset, pad_last=True, **loader_kwargs)

    config["vit_config"]["dropout"] = 0.0
    config["vit_config"]["emb_dropout"] = 0.0
    # PTQ: the checkpoint was trained fp32; the format is applied after
    # loading (reference test_quantize.py:90-103)
    kwargs = vit_kwargs_from_config(config, data_config)
    kwargs["q_format"] = q_format
    vit = ViT(**kwargs)

    assert (
        train_config["checkpoint_path"] != ""
    ), "Must provide a checkpoint path in the config file"
    tx = create_optimizer(train_config)
    sample = jnp.zeros((1, vit.image_size, vit.image_size, 3))
    state = init_train_state(vit, tx, jax.random.PRNGKey(0), sample)
    state, _ = prepare_model_and_load_ckpt(
        train_config, state, restore_optimizer=False
    )

    print(
        "Pre-quantization model size: "
        f"{model_size_mb({'params': state.params}, q_format, False)} MB"
    )

    state = calibrate(vit, state, val_loader, calib_steps)

    # convert: bake weight quantization (reference test_quantize.py:109)
    state = state.replace(params=convert_params(state.params, q_format))
    converted_kwargs = dict(kwargs, converted=True)
    vit_converted = ViT(**converted_kwargs)
    print(
        "\nPost-quantization model size: "
        f"{model_size_mb({'params': state.params}, q_format, True)} MB"
    )
    if save_converted:
        # converted checkpoint: int8/fp16 storage is real, so the file is
        # actually smaller on disk (reference quantize.py:329-348 stores
        # true torch quantized modules)
        save_checkpoint(state, save_converted, include_optimizer=False)
        print(
            "Converted checkpoint: "
            f"{save_converted} ({os.path.getsize(save_converted) / 1e6} MB)"
        )

    from myrtle_vision_tpu.training.classification import make_predict_fn

    predict_fn = make_predict_fn(vit_converted)
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
    parser.add_argument(
        "--calib_steps",
        type=int,
        default=10,
        help="Number of steps to calibrate the model on",
    )
    parser.add_argument(
        "--quantized_ckpt",
        action="store_true",
        help="If set, the checkpoint was trained with the config's q_format "
        "active (QAT); otherwise an fp32 checkpoint is post-training "
        "quantized",
    )
    parser.add_argument(
        "--save_converted",
        type=str,
        default=None,
        help="Write the converted (true int8/fp16 storage) checkpoint here",
    )
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.loads(f.read())

    test_deit(
        config, args.calib_steps, args.quantized_ckpt, args.save_converted
    )
