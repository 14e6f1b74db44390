"""Optimizer + LR schedule matching the reference's timm recipe, in optax.

The reference builds its optimizer/scheduler with timm's
``create_optimizer``/``create_scheduler`` from the train_config JSON
(reference: classification/train.py:161-166, utils/models.py:84-110).  We
reproduce the semantics the five BASELINE configs actually exercise:

- optimizer "adamw": AdamW with opt_eps / opt_betas / weight_decay, weight
  decay masked off 1-D params and biases (timm ``add_weight_decay`` skips
  ndim <= 1), momentum/"sgd" also supported.
- scheduler "cosine": timm CosineLRScheduler stepped per epoch
  (classification/train.py:287) — linear warmup from warmup_lr over
  warmup_epochs, single cosine cycle from lr to min_lr over the remaining
  epochs, min_lr afterwards (cooldown), optional per-epoch lr noise
  (lr_noise / lr_noise_pct / lr_noise_std).

The LR is an epoch-indexed host-side function; its value is fed into the
jitted train step as a scalar operand, so changing LR never recompiles.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax


def lr_at_epoch(train_config, epoch: int) -> float:
    """timm CosineLRScheduler.get_epoch_values equivalent."""
    lr = float(train_config["lr"])
    min_lr = float(train_config["min_lr"])
    warmup_lr = float(train_config["warmup_lr"])
    warmup_t = int(train_config["warmup_epochs"])
    t_initial = int(train_config["epochs"])

    if warmup_t > 0 and epoch < warmup_t:
        value = warmup_lr + epoch * (lr - warmup_lr) / warmup_t
    elif epoch < t_initial:
        t = epoch - warmup_t
        total = max(t_initial - warmup_t, 1)
        value = min_lr + 0.5 * (lr - min_lr) * (
            1 + math.cos(math.pi * t / total)
        )
    else:
        # past the single cosine cycle (cooldown epochs): floor
        value = min_lr

    value = _add_noise(train_config, value, epoch)
    return float(value)


def _add_noise(train_config, value, epoch):
    """timm Scheduler._add_noise: optional multiplicative LR noise applied
    from lr_noise * epochs onwards (normal, clipped to ±lr_noise_pct)."""
    lr_noise = train_config.get("lr_noise")
    if lr_noise is None:
        return value
    t_initial = int(train_config["epochs"])
    if isinstance(lr_noise, (list, tuple)):
        noise_range = [n * t_initial for n in lr_noise]
        active = noise_range[0] <= epoch < noise_range[1]
    else:
        active = epoch >= lr_noise * t_initial
    if not active:
        return value
    noise_pct = float(train_config.get("lr_noise_pct") or 0.67)
    noise_std = float(train_config.get("lr_noise_std") or 1.0)
    seed = int(train_config.get("seed", 42))
    rng = np.random.RandomState(seed + epoch)
    while True:
        noise = rng.normal(0, noise_std)
        if abs(noise) < noise_pct:
            break
    return value + value * noise


def _weight_decay_mask(params):
    """timm add_weight_decay: decay only multi-dim params (kernels and the
    pos/cls/det token embeddings); skip biases and norm scales."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def create_optimizer(train_config) -> optax.GradientTransformation:
    """Build the optax transformation from the reference train_config schema.

    The learning rate is injected per step via
    ``optax.inject_hyperparams`` — set
    ``opt_state.hyperparams['learning_rate']`` (done by the Trainer from
    :func:`lr_at_epoch`).
    """
    opt_name = train_config["optimizer"].lower()
    eps = float(train_config["opt_eps"])
    betas = train_config.get("opt_betas") or (0.9, 0.999)
    weight_decay = float(train_config["weight_decay"])
    momentum = float(train_config.get("momentum", 0.9))

    def make(learning_rate):
        if opt_name == "adamw":
            return optax.adamw(
                learning_rate=learning_rate,
                b1=betas[0],
                b2=betas[1],
                eps=eps,
                weight_decay=weight_decay,
                mask=_weight_decay_mask,
            )
        elif opt_name in ("sgd", "momentum", "nesterov"):
            return optax.chain(
                optax.add_decayed_weights(
                    weight_decay, mask=_weight_decay_mask
                ),
                optax.sgd(
                    learning_rate,
                    momentum=momentum,
                    nesterov=(opt_name == "nesterov"),
                ),
            )
        elif opt_name == "adam":
            return optax.adam(
                learning_rate, b1=betas[0], b2=betas[1], eps=eps
            )
        raise NotImplementedError(f"optimizer {opt_name}")

    tx = optax.inject_hyperparams(make)(
        learning_rate=float(train_config["lr"])
    )

    clip_grad = train_config.get("clip_grad")
    if clip_grad is not None:
        # torch clip_grad_norm_ applied before step
        # (classification/train.py:265-270)
        tx = optax.chain(optax.clip_by_global_norm(float(clip_grad)), tx)
    return tx


def set_learning_rate(opt_state, lr):
    """Return a copy of an inject_hyperparams opt state (possibly nested
    inside a chain when clip_grad is configured) with the LR replaced.
    Pure — safe to call inside jit with a traced ``lr``."""

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in getattr(
            state, "hyperparams", {}
        ):
            new = state._replace(
                hyperparams={
                    **state.hyperparams,
                    "learning_rate": jnp.asarray(lr, dtype=jnp.float32),
                }
            )
            return new, True
        if isinstance(state, tuple) and not hasattr(state, "_fields"):
            out, found = [], False
            for s in state:
                if found:
                    out.append(s)
                else:
                    ns, f = visit(s)
                    out.append(ns)
                    found = f
            return tuple(out), found
        return state, False

    new_state, found = visit(opt_state)
    if not found:
        raise ValueError("no injected learning_rate found in opt state")
    return new_state


def cross_entropy_loss(logits, labels):
    """Mean softmax cross entropy with integer labels
    (torch.nn.CrossEntropyLoss equivalent)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)
