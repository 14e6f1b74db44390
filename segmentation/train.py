#!/usr/bin/env python
"""DLRSD semantic segmentation trainer (TPU-native).

Reference parity: ``python train.py -c train_configs/seg_small.json``
(reference: segmentation/train.py) — same skeleton as the classification
trainer with joint image/mask augmentation, pixel CE loss, and validation
that computes streaming mIoU and logs accuracy/loss/miou scalars
(reference train.py:33-75).
"""
import argparse
import json
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from myrtle_vision_tpu.data.loader import DataLoader, prefetch_to_device
from myrtle_vision_tpu.parallel.collectives import initialize_multihost
from myrtle_vision_tpu.datasets.dlrsd import Dlrsd
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.parallel.mesh import mesh_from_dist_config
from myrtle_vision_tpu.parallel.tp import fused_gate as tp_fused_gate
from myrtle_vision_tpu.training.classification import make_predict_fn
from myrtle_vision_tpu.training.optim import create_optimizer, lr_at_epoch
from myrtle_vision_tpu.training.segmentation import (
    make_loss_fn,
    pixel_cross_entropy,
)
from myrtle_vision_tpu.training.trainer import (
    init_train_state,
    make_train_step,
    state_shardings,
)
from myrtle_vision_tpu.utils.checkpoint import (
    prepare_model_and_load_ckpt,
    save_checkpoint,
)
from myrtle_vision_tpu.utils.config import (
    get_batch_sizes,
    parse_config,
    seed_everything,
)
from myrtle_vision_tpu.utils.logging import ScalarLogger
from myrtle_vision_tpu.utils.profiling import StepProfiler
from myrtle_vision_tpu.utils.metrics import MIoU

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)


def validation(predict_fn, state, val_loader, n_classes, iteration, writer):
    """Loss / pixel accuracy / streaming mIoU over the validation split
    (reference segmentation/train.py:35-75)."""
    total_loss, total_acc, n = 0.0, 0.0, 0
    miou = MIoU(num_classes=n_classes)
    for batch in val_loader.epoch(0):
        images = jnp.asarray(batch["image"])
        labels = jnp.asarray(batch["label"], jnp.int32)
        logits = predict_fn(state.params, state.quant, images)
        total_loss += float(pixel_cross_entropy(logits, labels))
        preds = jnp.argmax(logits, -1)
        total_acc += float(
            jnp.mean((preds == labels).astype(jnp.float32))
        )
        miou.add_batch(np.asarray(preds), np.asarray(labels))
        n += 1
    val_loss = total_loss / max(n, 1)
    val_acc = total_acc / max(n, 1)
    miou_value = miou.get_miou() if n else 0.0
    print(f"miou is {miou_value}")
    writer.add_scalar("accuracy", val_acc, iteration)
    writer.add_scalar("loss", val_loss, iteration)
    writer.add_scalar("miou", miou_value, iteration)
    return val_loss, val_acc


def train(config):
    train_config = config["train_config"]
    data_config = parse_config(config["data_config_path"])
    n_classes = data_config["number_of_classes"]

    epochs = train_config["epochs"]
    output_directory = train_config["output_directory"]
    iters_per_checkpoint = train_config["iters_per_checkpoint"]
    iters_per_val = train_config["iters_per_val"]
    seed = train_config["seed"]

    seed_everything(seed)
    initialize_multihost()
    writer = ScalarLogger("runs/")

    num_devices = len(jax.devices())
    if not train_config.get("distributed", True):
        num_devices = 1
    mesh = mesh_from_dist_config(config.get("dist_config"), num_devices)
    n_data = mesh.devices.shape[0]

    batch_size, n_batch_accum = get_batch_sizes(
        train_config["local_batch_size"],
        n_data,
        train_config["global_batch_size"],
        verbose=True,
    )
    train_config["n_batch_accum"] = n_batch_accum
    global_micro_batch = batch_size * n_data
    step_batch = global_micro_batch * n_batch_accum

    # only process 0 saves checkpoints; non-zero processes must not
    # create their own (datetime-suffixed) output dirs
    if jax.process_index() == 0:
        os.makedirs(output_directory, exist_ok=True)
    print("output directory:", output_directory)

    trainset = Dlrsd(
        mode="train",
        dataset_path=data_config["dataset_path"],
        imagepaths=data_config["train_files"],
        label_map_path=data_config["label_map"],
        transform_config=data_config["transform_ops_train"],
    )
    valset = Dlrsd(
        mode="eval",
        dataset_path=data_config["dataset_path"],
        imagepaths=data_config["valid_files"],
        label_map_path=data_config["label_map"],
        transform_config=data_config["transform_ops_val"],
    )
    # multi-host: identical global permutation on every process, each
    # decodes only its block (see classification/train.py)
    pid, pcount = jax.process_index(), jax.process_count()
    train_loader = DataLoader(
        trainset,
        batch_size=step_batch,
        shuffle=True,
        seed=seed,
        drop_last=(
            train_config["drop_last_batch"] if pcount == 1 else True
        ),
        process_shard=(pid, pcount) if pcount > 1 else None,
        accum_steps=n_batch_accum,
    )
    val_loader = DataLoader(
        valset,
        batch_size=batch_size,  # local batch, like the reference val loader
        drop_last=train_config["drop_last_batch"],
    )

    vit = ViT(**vit_kwargs_from_config(config, data_config))
    # head-sharded TP through the fused kernels (parallel/tp.py)
    tp_fused, train_model = tp_fused_gate(vit, mesh)
    tx = create_optimizer(train_config)
    state = init_train_state(
        vit,
        tx,
        jax.random.PRNGKey(seed),
        jnp.zeros((1, vit.image_size, vit.image_size, 3)),
        mesh=mesh,
        tp_fused=tp_fused,
    )

    pretrained = train_config.get("pretrained_backbone")
    if pretrained is not None:
        from myrtle_vision_tpu.utils.pretrained import (
            load_pretrained_backbone,
        )

        try:
            merged = load_pretrained_backbone(state.params, pretrained)
            state = state.replace(
                params=jax.device_put(
                    merged,
                    state_shardings(state, mesh, tp_fused=tp_fused).params,
                )
            )
            print(f"loaded pretrained backbone: {pretrained}")
        except RuntimeError as e:
            print(f"WARNING: pretrained backbone unavailable ({e}); "
                  "training from scratch")

    state, iteration = prepare_model_and_load_ckpt(train_config, state)

    sharding = state_shardings(state, mesh, tp_fused=tp_fused)
    batch_shard = {
        "image": NamedSharding(mesh, P(None, "data")),
        "label": NamedSharding(mesh, P(None, "data")),
    }
    train_step = make_train_step(
        make_loss_fn(train_model),
        tx,
        n_batch_accum,
        mesh=mesh,
        state_sharding=sharding,
        batch_sharding=batch_shard,
        tp_fused=tp_fused,
    )
    predict_fn = make_predict_fn(vit)

    feed_micro_batch = global_micro_batch // pcount

    def reshape(batch):
        return {
            k: v.reshape((n_batch_accum, feed_micro_batch) + v.shape[1:])
            for k, v in batch.items()
        }

    rng = jax.random.PRNGKey(seed)
    epoch_offset = max(
        0, int(batch_size * n_data * iteration / len(trainset))
    )
    last_val_loss, last_val_acc = 0.0, 0.0
    steps_per_epoch = len(train_loader)
    profiler = StepProfiler()

    for epoch in range(epoch_offset, epochs):
        lr = lr_at_epoch(train_config, epoch)
        epoch_loss, epoch_acc = 0.0, 0.0
        t_epoch = time.time()
        for batch in prefetch_to_device(
            train_loader.epoch(epoch), sharding=batch_shard, reshape=reshape
        ):
            # main-process work (reference rank-0 guard)
            if iteration % iters_per_checkpoint == 0 and pid == 0:
                save_checkpoint(
                    state, f"{output_directory}/vit_{iteration:06}"
                )
            if iteration % iters_per_val == 0 and pid == 0:
                eval_state = state
                if pcount > 1:
                    eval_state = state.replace(
                        params=jax.tree_util.tree_map(
                            np.asarray, state.params
                        ),
                        quant=jax.tree_util.tree_map(
                            np.asarray, state.quant
                        ),
                    )
                last_val_loss, last_val_acc = validation(
                    predict_fn, eval_state, val_loader, n_classes,
                    iteration, writer,
                )

            state, metrics = train_step(
                state, batch, lr, jax.random.fold_in(rng, iteration)
            )
            iteration += 1
            profiler.step(iteration)
            loss, acc = float(metrics["loss"]), float(metrics["acc"])
            epoch_loss += loss / steps_per_epoch
            epoch_acc += acc / steps_per_epoch
            if pid == 0:
                print(
                    f"Iteration {iteration}:\tloss={loss:.4f}\t"
                    f"acc={acc:.4f}"
                )

        if pid != 0:
            continue
        print(
            f"Epoch : {epoch + 1} - loss : {epoch_loss:.4f} - "
            f"acc: {epoch_acc:.4f} - "
            f"val_loss : {last_val_loss:.4f} - "
            f"val_acc: {last_val_acc:.4f} - "
            f"time: {time.time() - t_epoch:.1f}s\n"
        )

    profiler.close()
    if pid == 0:
        save_checkpoint(state, f"{output_directory}/vit_{iteration:06}")
    writer.flush()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c", "--config", type=str, help="JSON file for configuration"
    )
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.loads(f.read())

    config["train_config"]["output_directory"] += datetime.now().strftime(
        "_%m_%d_%Y_%H_%M_%S"
    )
    train(config)
