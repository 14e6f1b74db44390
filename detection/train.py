#!/usr/bin/env python
"""DIOR object detection trainer (YOLOS-style ViT + DETR loss, TPU-native).

Reference parity: ``python train.py -c train_configs/yolos_small.json``
(reference: detection/train.py) — same skeleton as the other trainers plus:
the DETR criterion with config-driven loss weights (train.py:199-215),
optional train/valid random subsetting (train.py:126-146), per-epoch COCO
validation (train.py:289-302), best-AP checkpointing (train.py:304-319) and
TensorBoard hparams/lr/AP scalars (train.py:117-124,321-323).

TPU adaptation: variable-size images are padded to bucketed static shapes
(transforms/detection.py:collate_detection) so XLA compiles a bounded set
of programs instead of one per image size; targets are padded to
``num_det_tokens`` boxes with a validity mask.
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

from myrtle_vision_tpu.data.loader import DataLoader, shard_host_batch
from myrtle_vision_tpu.parallel.collectives import initialize_multihost
from myrtle_vision_tpu.datasets.coco import CocoDetection
from myrtle_vision_tpu.models.detector import build_weight_dict
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.parallel.mesh import mesh_from_dist_config
from myrtle_vision_tpu.parallel.tp import fused_gate as tp_fused_gate
from myrtle_vision_tpu.training.detection import (
    evaluate_coco,
    make_detect_fn,
    make_loss_fn,
    make_match_fn,
    use_split_matching,
)
from myrtle_vision_tpu.training.optim import create_optimizer, lr_at_epoch
from myrtle_vision_tpu.training.trainer import (
    init_train_state,
    make_train_step,
    state_shardings,
)
from myrtle_vision_tpu.transforms import detection as T
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

# platform override (the container sitecustomize pins the TPU plugin above
# the JAX_PLATFORMS env var; MVT_PLATFORM=cpu forces host execution)
if os.environ.get("MVT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MVT_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_{os.environ.get('MVT_PLATFORM', 'tpu')}",
)


def train(config):
    train_config = config["train_config"]
    vit_config = config["vit_config"]
    data_config = parse_config(config["data_config_path"])
    n_classes = data_config["number_of_classes"]
    num_det_tokens = vit_config.get("num_det_tokens", 100)

    epochs = train_config["epochs"]
    output_directory = train_config["output_directory"]
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

    dataset_path = data_config["dataset_path"]
    collate = lambda items: T.collate_detection(  # noqa: E731
        items, max_boxes=num_det_tokens
    )
    trainset = CocoDetection(
        os.path.join(dataset_path, data_config["train_images"]),
        os.path.join(dataset_path, "annotations", data_config["train_annotations"]),
        T.from_config(data_config["transform_ops_train"]),
        subset=data_config.get("train_subset"),
    )
    valset = CocoDetection(
        os.path.join(dataset_path, data_config["valid_images"]),
        os.path.join(dataset_path, "annotations", data_config["valid_annotations"]),
        T.from_config(data_config["transform_ops_val"]),
        subset=data_config.get("valid_subset"),
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
        collate_fn=collate,
        process_shard=(pid, pcount) if pcount > 1 else None,
        accum_steps=n_batch_accum,
    )
    val_loader = DataLoader(
        valset,
        batch_size=batch_size,
        drop_last=False,
        collate_fn=collate,
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

    weight_dict = build_weight_dict(train_config)
    sharding = state_shardings(state, mesh, tp_fused=tp_fused)
    data_spec = NamedSharding(mesh, P(None, "data"))
    batch_shard = {
        "image": data_spec,
        "labels": data_spec,
        "boxes": data_spec,
        "valid": data_spec,
    }
    split_match = use_split_matching()
    if split_match:
        if pcount > 1:
            raise NotImplementedError(
                "split matching (single-chip axon runtime workaround) "
                "is incompatible with multi-process meshes"
            )
        batch_shard["src_idx"] = data_spec
        match_fn = make_match_fn(vit)
    train_step = make_train_step(
        make_loss_fn(
            train_model, n_classes, weight_dict, train_config["eos_coef"]
        ),
        tx,
        n_batch_accum,
        mesh=mesh,
        state_sharding=sharding,
        batch_sharding=batch_shard,
        tp_fused=tp_fused,
    )
    detect_fn = make_detect_fn(vit)

    writer.add_hparams(
        {**train_config, **vit_config}, {"metric/placeholder": 0.0}
    )

    rng = jax.random.PRNGKey(seed)
    profiler = StepProfiler()
    best_ap = -1.0
    epoch_offset = max(
        0, int(batch_size * n_data * iteration / max(len(trainset), 1))
    )

    for epoch in range(epoch_offset, epochs):
        lr = lr_at_epoch(train_config, epoch)
        writer.add_scalar("lr", lr, epoch)
        epoch_loss = 0.0
        steps = max(len(train_loader), 1)
        t_epoch = time.time()
        for batch in train_loader.epoch(epoch):
            step_in = {
                k: batch[k].reshape(
                    (n_batch_accum, global_micro_batch // pcount)
                    + batch[k].shape[1:]
                )
                for k in ("image", "labels", "boxes", "valid")
            }
            # transfer ONCE, then feed device arrays to both programs:
            # the tunneled TPU client leaks host RSS proportional to H2D
            # traffic (ROUND3_NOTES), and the matcher re-transferring the
            # host batch doubled it
            if split_match:
                step_in = shard_host_batch(step_in, {
                    k: batch_shard[k] for k in step_in
                })
                # separate matcher program (see training/detection.py:
                # make_match_fn for why); re-lay its output to the
                # batch sharding (device-to-device, no host copy)
                step_in["src_idx"] = jax.device_put(
                    match_fn(state, step_in), batch_shard["src_idx"]
                )
            else:
                step_in = shard_host_batch(step_in, batch_shard)
            state, metrics = train_step(
                state, step_in, lr, jax.random.fold_in(rng, iteration)
            )
            iteration += 1
            profiler.step(iteration)
            loss = float(metrics["loss"])
            epoch_loss += loss / steps
            if pid == 0:
                print(
                    f"Iteration {iteration}:\tloss={loss:.4f}\t"
                    f"ce={float(metrics['loss_ce']):.4f}\t"
                    f"bbox={float(metrics['loss_bbox']):.4f}\t"
                    f"giou={float(metrics['loss_giou']):.4f}"
                )

        # per-epoch COCO validation + best-AP checkpointing, main
        # process only (reference train.py:289-319 rank-0 guard)
        if pid != 0:
            continue
        eval_state = state
        if pcount > 1:
            eval_state = state.replace(
                params=jax.tree_util.tree_map(np.asarray, state.params),
                quant=jax.tree_util.tree_map(np.asarray, state.quant),
            )
        evaluator = evaluate_coco(
            detect_fn, eval_state, val_loader, valset.coco, epoch
        )
        ap = float(evaluator.stats[0])
        writer.add_scalar("val_AP", ap, epoch)
        print(
            f"Epoch : {epoch + 1} - loss : {epoch_loss:.4f} - "
            f"val AP: {ap:.4f} - time: {time.time() - t_epoch:.1f}s\n"
        )
        if ap >= best_ap:
            best_ap = ap
            save_checkpoint(
                state, f"{output_directory}/vit_best", extra={"ap": ap}
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
