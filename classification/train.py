#!/usr/bin/env python
"""RESISC45 classification trainer (TPU-native).

Drop-in replacement for the reference CLI (reference:
classification/train.py): ``python train.py -c train_configs/vit_small.json``
with the identical JSON config schema.  Architectural inversion: instead of
``mp.spawn`` one process per GPU + DDP/NCCL (reference train.py:349-358),
one process drives all local devices with a single jitted SPMD train step
over a (data, model) mesh; gradients reduce over ICI via XLA collectives.
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
from myrtle_vision_tpu.datasets.resisc45 import Resisc45
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.parallel.mesh import mesh_from_dist_config
from myrtle_vision_tpu.parallel.tp import fused_gate as tp_fused_gate
from myrtle_vision_tpu.training.classification import (
    make_loss_fn,
    make_predict_fn,
)
from myrtle_vision_tpu.training.optim import (
    create_optimizer,
    cross_entropy_loss,
    lr_at_epoch,
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
from myrtle_vision_tpu.utils.profiling import StepProfiler

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)


def build_models(config, data_config):
    """ViT (+ DistillWrapper/teacher) from config
    (reference utils/models.py:25-60)."""
    vit = ViT(**vit_kwargs_from_config(config, data_config))
    distiller = teacher_fn = None
    if "distiller_config" in config:
        from myrtle_vision_tpu.models.distill import DistillWrapper
        from myrtle_vision_tpu.models.resnet import make_teacher_fn

        dc = config["distiller_config"]
        distiller = DistillWrapper(
            student=vit,
            temperature=dc["temperature"],
            alpha=dc["alpha"],
        )
        teacher_fn = make_teacher_fn(dc["teacher_weights_path"])
    return vit, distiller, teacher_fn


def validation(predict_fn, state, val_loader, distill_eval=None):
    """Full-validation loss/accuracy (reference train.py:29-52)."""
    total_loss, total_acc, n = 0.0, 0.0, 0
    for batch in val_loader.epoch(0):
        images = jnp.asarray(batch["image"])
        labels = jnp.asarray(batch["label"])
        logits = predict_fn(state.params, state.quant, images)
        if distill_eval is not None:
            loss = distill_eval(images, labels)
        else:
            loss = cross_entropy_loss(logits, labels)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        total_loss += float(loss)
        total_acc += float(acc)
        n += 1
    return total_loss / max(n, 1), total_acc / max(n, 1)


def train(config):
    train_config = config["train_config"]
    dist_config = config.get("dist_config")
    data_config = parse_config(config["data_config_path"])

    epochs = train_config["epochs"]
    output_directory = train_config["output_directory"]
    iters_per_checkpoint = train_config["iters_per_checkpoint"]
    iters_per_val = train_config["iters_per_val"]
    seed = train_config["seed"]

    seed_everything(seed)
    # multi-host (DCN) joins when MVT_COORDINATOR etc. are set; the same
    # SPMD program then spans all hosts' devices
    initialize_multihost()

    num_devices = len(jax.devices())
    if not train_config.get("distributed", True):
        num_devices = 1
    mesh = mesh_from_dist_config(dist_config, num_devices=num_devices)
    n_data = mesh.devices.shape[0]

    batch_size, n_batch_accum = get_batch_sizes(
        train_config["local_batch_size"],
        n_data,
        train_config["global_batch_size"],
        verbose=True,
    )
    train_config["local_batch_size"] = batch_size
    train_config["global_batch_size"] = batch_size * n_batch_accum * n_data
    train_config["n_batch_accum"] = n_batch_accum
    global_micro_batch = batch_size * n_data
    step_batch = global_micro_batch * n_batch_accum

    # only process 0 saves checkpoints; non-zero processes must not
    # create their own (datetime-suffixed) output dirs
    if jax.process_index() == 0:
        os.makedirs(output_directory, exist_ok=True)
    print("output directory:", output_directory)
    print(
        f"devices: {num_devices} (data={n_data}, "
        f"model={mesh.devices.shape[1]}), local_batch={batch_size}, "
        f"n_accum={n_batch_accum}"
    )

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
    # multi-host: every process computes the same global permutation and
    # decodes only its contiguous block of each global micro-batch
    # (reference DistributedSampler semantics, train.py:116);
    # prefetch_to_device assembles the global sharded array from the
    # per-process blocks
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
        shuffle=False,
        seed=seed,
        drop_last=train_config["drop_last_batch"],
    )

    vit, distiller, teacher_fn = build_models(config, data_config)
    train_model = distiller if distiller is not None else vit

    # head-sharded tensor parallelism through the fused kernels
    # (parallel/tp.py): the training model carries tp_axis="model" so
    # each Block runs the fused Pallas kernels on its local head slice;
    # falls back to the GSPMD TP path (gathers around the kernels) when
    # unsupported (quant formats, distillation, non-dividing heads)
    tp_fused, tp_model = tp_fused_gate(
        vit, mesh, extra_ok=distiller is None
    )
    if tp_fused:
        train_model = tp_model

    tx = create_optimizer(train_config)
    sample = jnp.zeros(
        (1, vit.image_size, vit.image_size, 3), jnp.float32
    )
    rng = jax.random.PRNGKey(seed)
    if distiller is not None:
        state = init_train_state(
            distiller,
            tx,
            rng,
            sample,
            mesh=mesh,
            labels=jnp.zeros((1,), jnp.int32),
            teacher_logits=jnp.zeros(
                (1, data_config["number_of_classes"]), jnp.float32
            ),
        )
    else:
        state = init_train_state(
            vit, tx, rng, sample, mesh=mesh, tp_fused=tp_fused
        )

    # Pretrained timm backbone import (reference train.py:137-148)
    pretrained = train_config.get("pretrained_backbone")
    if pretrained is not None:
        from myrtle_vision_tpu.utils.pretrained import (
            load_pretrained_backbone,
        )

        target = state.params
        if distiller is not None:
            target = target["student"]
        try:
            merged = load_pretrained_backbone(target, pretrained)
            if distiller is not None:
                params = dict(state.params)
                params["student"] = merged
            else:
                params = merged
            state = state.replace(
                params=jax.device_put(
                    params,
                    state_shardings(state, mesh, tp_fused=tp_fused).params,
                )
            )
            print(f"loaded pretrained backbone: {pretrained}")
        except RuntimeError as e:
            print(f"WARNING: pretrained backbone unavailable ({e}); "
                  "training from scratch")

    state, iteration = prepare_model_and_load_ckpt(train_config, state)

    loss_fn = make_loss_fn(
        train_model if distiller is None else vit,
        distiller=distiller,
        teacher_fn=teacher_fn,
    )
    sharding = state_shardings(state, mesh, tp_fused=tp_fused)
    batch_shard = {
        "image": NamedSharding(mesh, P(None, "data")),
        "label": NamedSharding(mesh, P(None, "data")),
    }
    train_step = make_train_step(
        loss_fn,
        tx,
        n_batch_accum,
        mesh=mesh,
        state_sharding=sharding,
        batch_sharding=batch_shard,
        tp_fused=tp_fused,
    )
    predict_fn = make_predict_fn(vit)

    def distill_eval(images, labels):
        """Validation loss through the distiller (reference train.py:41-44
        uses the distillation loss for val when a distiller exists)."""
        teacher_logits = teacher_fn(images)
        variables = {"params": state.params}
        if state.quant:
            variables["quant"] = state.quant
        loss, _ = distiller.apply(
            variables, images, labels, teacher_logits, deterministic=True
        )
        return loss

    # multi-host: the host batch holds only this process's rows; the
    # reshape therefore targets the LOCAL micro-batch and
    # prefetch_to_device scales the batch dim back up when assembling the
    # global array
    feed_micro_batch = global_micro_batch // pcount

    def reshape(batch):
        return {
            "image": batch["image"].reshape(
                (n_batch_accum, feed_micro_batch)
                + batch["image"].shape[1:]
            ),
            "label": batch["label"].reshape(
                (n_batch_accum, feed_micro_batch)
            ),
        }

    # epoch offset on resume (reference formula, train.py:181-183)
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
        batches = prefetch_to_device(
            train_loader.epoch(epoch), sharding=batch_shard, reshape=reshape
        )
        for batch in batches:
            # checkpointing and validation are main-process work (the
            # reference's rank-0 guard, train.py:203-237); params are
            # replicated over the data axis so process 0 addresses them
            if iteration % iters_per_checkpoint == 0 and pid == 0:
                checkpoint_path = f"{output_directory}/vit_{iteration:06}"
                save_checkpoint(state, checkpoint_path)
            if iteration % iters_per_val == 0 and pid == 0:
                eval_state = state
                if pcount > 1:
                    # localize the (data-replicated) params so the eval
                    # jit runs on this process's devices only — mixing
                    # global-mesh arrays with host-local eval batches is
                    # not addressable
                    eval_state = state.replace(
                        params=jax.tree_util.tree_map(
                            np.asarray, state.params
                        ),
                        quant=jax.tree_util.tree_map(
                            np.asarray, state.quant
                        ),
                    )
                if distiller is not None:
                    eval_state = eval_state.replace(
                        params=eval_state.params["student"]
                    )
                last_val_loss, last_val_acc = validation(
                    predict_fn,
                    eval_state,
                    val_loader,
                    distill_eval=(
                        distill_eval if distiller is not None else None
                    ),
                )

            step_rng = jax.random.fold_in(rng, iteration)
            state, metrics = train_step(state, batch, lr, step_rng)
            iteration += 1
            profiler.step(iteration)
            loss = float(metrics["loss"])
            acc = float(metrics["acc"])
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
    # final checkpoint
    if pid == 0:
        save_checkpoint(state, f"{output_directory}/vit_{iteration:06}")


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
