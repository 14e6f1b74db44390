#!/usr/bin/env python
"""Finetune a CNN teacher on RESISC45 (script form of the reference's
Finetune_CNN_Resisc45.ipynb notebook).

The reference finetunes torchvision CNNs (resnet18/resnet50/...) to produce
the frozen distillation teacher weights (reference:
classification/Finetune_CNN_Resisc45.ipynb + utils/models.py:14-22).  This
CLI does the same with JAX compute, operating directly on a torch-layout
state dict so the output .pth loads anywhere a torchvision checkpoint does:

  - initial weights: an ImageNet .pth if provided (--init_weights), else
    He-init random (models/cnn.py:random_any_state_dict);
  - the classifier head is re-shaped to the dataset's class count;
  - finetuning recipe: SGD momentum 0.9, frozen batch-norm statistics
    (gamma/beta trainable) — the standard torchvision finetuning setup;
  - saves torch.save()-compatible weights usable by test_cnn.py and as
    distiller_config.teacher_weights_path.

Usage: python finetune_cnn.py --model resnet50 --epochs 5 --lr 1e-3 \
           --output resnet50_resisc45_pyt_finetuned_weights.pth
"""
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.datasets.resisc45 import Resisc45
from myrtle_vision_tpu.models.cnn import apply_any_torch_sd
from myrtle_vision_tpu.training.optim import cross_entropy_loss
from myrtle_vision_tpu.utils.config import parse_config, seed_everything

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)


def load_initial_sd(model_name, num_classes, init_weights):
    from myrtle_vision_tpu.models.cnn import head_keys, random_any_state_dict

    if init_weights:
        import torch

        sd = torch.load(init_weights, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        # reshape the classifier head for this dataset
        rng = np.random.RandomState(0)
        wk, bk, conv_head = head_keys(model_name)
        in_features = sd[wk].shape[1]
        shape = (
            (num_classes, in_features, 1, 1) if conv_head
            else (num_classes, in_features)
        )
        sd[wk] = (
            rng.randn(*shape) * in_features ** -0.5
        ).astype(np.float32)
        sd[bk] = np.zeros(num_classes, np.float32)
        return sd
    return random_any_state_dict(model_name, num_classes)


def is_trainable(key):
    # frozen BN statistics; everything else (convs, fc, BN gamma/beta)
    # finetunes
    return not (
        key.endswith("running_mean")
        or key.endswith("running_var")
        or key.endswith("num_batches_tracked")
    )


def finetune(model_name, data_config_path, epochs, batch_size, lr,
             init_weights, output):
    data_config = parse_config(data_config_path)
    seed_everything(0)
    num_classes = data_config["number_of_classes"]
    sd = load_initial_sd(model_name, num_classes, init_weights)
    params = {k: jnp.asarray(v) for k, v in sd.items()
              if not k.endswith("num_batches_tracked")}

    trainset = Resisc45(
        mode="train",
        dataset_path=data_config["dataset_path"],
        imagepaths=data_config["train_files"],
        label_map_path=data_config["label_map"],
        transform_config=data_config["transform_ops_train"],
    )
    valset = Resisc45(
        mode="eval",
        dataset_path=data_config["dataset_path"],
        imagepaths=data_config["valid_files"],
        label_map_path=data_config["label_map"],
        transform_config=data_config["transform_ops_val"],
    )
    train_loader = DataLoader(
        trainset, batch_size=batch_size, shuffle=True, seed=0
    )
    val_loader = DataLoader(valset, batch_size=batch_size, drop_last=False)

    mask = {k: is_trainable(k) for k in params}
    # global-norm clipping keeps early finetuning stable even from random
    # init (He-init ResNet grads can reach norm ~1e2)
    tx = optax.masked(
        optax.chain(
            optax.clip_by_global_norm(5.0),
            optax.sgd(lr, momentum=0.9),
        ),
        mask,
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, images, labels):
        def loss_fn(p):
            # train-mode BN: batch statistics + EMA running-stat updates
            # (torch model.train() finetuning semantics)
            logits, new_stats = apply_any_torch_sd(
                p, images, model_name, train=True
            )
            return cross_entropy_loss(logits, labels), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {**params, **new_stats}
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, images):
        return apply_any_torch_sd(params, images, model_name)

    for epoch in range(epochs):
        epoch_loss, steps = 0.0, 0
        for batch in train_loader.epoch(epoch):
            params, opt_state, loss = train_step(
                params, opt_state,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["label"]),
            )
            epoch_loss += float(loss)
            steps += 1
        correct, total = 0, 0
        for batch in val_loader.epoch(0):
            logits = eval_step(params, jnp.asarray(batch["image"]))
            correct += int(
                np.sum(np.argmax(np.asarray(logits), -1) == batch["label"])
            )
            total += len(batch["label"])
        print(
            f"Epoch {epoch + 1}: loss={epoch_loss / max(steps, 1):.4f} "
            f"val_acc={correct / max(total, 1):.4f}"
        )

    import torch

    out_sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in params.items()
    }
    # torch BatchNorm state dicts carry num_batches_tracked; a strict
    # load (reference utils/models.py:17 get_teacher) rejects their
    # absence, so emit one per BN alongside the running stats
    for k in list(out_sd):
        if k.endswith("running_mean"):
            out_sd[k[: -len("running_mean")] + "num_batches_tracked"] = (
                torch.tensor(0, dtype=torch.int64)
            )
    torch.save(out_sd, output)
    print(f"saved finetuned weights to {output}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="resnet50")
    parser.add_argument(
        "--data_config", type=str,
        default="data_configs/data_config.json",
    )
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument(
        "--init_weights", type=str, default=None,
        help="Optional ImageNet-pretrained torchvision .pth to start from",
    )
    parser.add_argument(
        "--output", type=str,
        default="resnet50_resisc45_pyt_finetuned_weights.pth",
    )
    args = parser.parse_args()
    finetune(
        args.model, args.data_config, args.epochs, args.batch_size,
        args.lr, args.init_weights, args.output,
    )
