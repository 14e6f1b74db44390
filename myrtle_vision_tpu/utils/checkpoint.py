"""Checkpoint save/restore with the reference's logical schema.

The reference stores {"model", "optimizer", "lr_scheduler", "iteration"} via
torch.save (reference: src/myrtle_vision/utils/models.py:113-141); we keep
the same logical keys over a flax msgpack payload so resume semantics match:
``prepare_model_and_load_ckpt`` resumes from ``train_config["checkpoint_path"]``
when non-empty and returns the restored iteration (utils/models.py:63-81).

The LR schedule is a pure function of (config, epoch) here, so the
"lr_scheduler" entry only records the epoch-schedule metadata — there is no
mutable scheduler state to restore (an improvement over torch's stateful
scheduler, kept key-compatible).
"""
from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    # to_state_dict converts custom pytree nodes (optax states) into plain
    # nested dicts that msgpack can serialize
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x), serialization.to_state_dict(tree)
    )


def save_checkpoint(state, filepath, extra=None, include_optimizer=True):
    """Serialize a TrainState as {model, optimizer, quant, lr_scheduler,
    iteration} (reference utils/models.py:113-126).  Deployment/converted
    checkpoints pass include_optimizer=False (weights + observer state
    only — the FPGA handoff doesn't carry optimizer moments)."""
    payload = {
        "model": _to_host(state.params),
        "optimizer": _to_host(state.opt_state) if include_optimizer else None,
        "quant": _to_host(state.quant),
        "lr_scheduler": extra or {},
        "iteration": int(state.iteration),
    }
    data = serialization.msgpack_serialize(payload)
    tmp = filepath + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, filepath)


def load_checkpoint(state, filepath, restore_optimizer=True):
    """Restore into an existing TrainState template; returns
    (state, iteration) (reference utils/models.py:129-141)."""
    with open(filepath, "rb") as f:
        payload = serialization.msgpack_restore(f.read())

    model_tree = payload["model"]
    saved_quant = payload.get("quant") or {}
    if (
        isinstance(model_tree, dict)
        and "student" in model_tree
        and not (
            isinstance(state.params, dict) and "student" in state.params
        )
    ):
        # distillation training checkpoints hold the DistillWrapper tree
        # {student, distillation_token, distill_mlp}; evaluating with a
        # plain ViT template reads the student subtree — the analogue of
        # the reference, whose distill runs save only the student
        # (reference classification/train.py:210-217 saves model=vit)
        model_tree = model_tree["student"]
        if isinstance(saved_quant, dict) and "student" in saved_quant:
            saved_quant = saved_quant["student"]

    params = serialization.from_state_dict(state.params, model_tree)
    if saved_quant:
        quant = serialization.from_state_dict(state.quant, saved_quant)
    else:
        # fp32 checkpoint loaded into a quant-prepared model (PTQ flow:
        # reference test_quantize.py:90-103 applies the format AFTER the
        # weight load) — keep the fresh observer state
        quant = state.quant
    iteration = int(payload["iteration"])
    new_state = state.replace(
        params=params,
        quant=quant,
        iteration=jax.numpy.asarray(iteration, jax.numpy.int32),
    )
    if restore_optimizer and payload.get("optimizer") is not None:
        opt_state = serialization.from_state_dict(
            state.opt_state, payload["optimizer"]
        )
        new_state = new_state.replace(opt_state=opt_state)
    return new_state, iteration


def prepare_model_and_load_ckpt(train_config, state, restore_optimizer=True):
    """Resume from train_config["checkpoint_path"] if set, else iteration 0
    (reference utils/models.py:63-81)."""
    path = train_config.get("checkpoint_path", "")
    if path:
        return load_checkpoint(
            state, path, restore_optimizer=restore_optimizer
        )
    return state, 0
