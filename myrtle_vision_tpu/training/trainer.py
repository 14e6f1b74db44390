"""SPMD training core: jitted train/eval steps over a device mesh.

TPU-native inversion of the reference's hot loop
(reference: classification/train.py:187-295): instead of an eager loop with
DDP all-reduce hooks, one jitted SPMD program per optimizer step that

  - lax.scans over ``n_accum`` micro-batches (gradient accumulation,
    reference utils/utils.py:86-125 + train.py:239-277),
  - SUMS micro-batch gradients (the reference calls backward() per
    micro-batch without dividing by n_accum — gradients accumulate by sum;
    we reproduce that exactly so training dynamics match),
  - averages over the data-parallel mesh axis (XLA inserts the psum where
    DDP would all-reduce via NCCL, riding ICI),
  - applies the optax update with the epoch's LR fed in as a scalar operand
    (no recompile on LR change).

State is donated so params/opt-state update in place in HBM.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from myrtle_vision_tpu.parallel.mesh import param_shardings
from myrtle_vision_tpu.training.optim import set_learning_rate


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    quant: Any  # INT8 observer collection ({} unless PyTorchINT8)
    iteration: jnp.ndarray  # scalar int32, optimizer-step count


def init_train_state(model, tx, rng, sample_input, mesh=None,
                     tp_fused=False, **init_kwargs):
    """Initialize params (+quant stats) and optimizer state, placed according
    to the tensor-parallel layout when a mesh is given."""
    variables = model.init(rng, sample_input, **init_kwargs)
    params = variables["params"]
    quant = variables.get("quant", {})
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        quant=quant,
        iteration=jnp.zeros((), jnp.int32),
    )
    if mesh is not None:
        shardings = state_shardings(state, mesh, tp_fused=tp_fused)
        state = jax.device_put(state, shardings)
    return state


def state_shardings(state: TrainState, mesh, tp_fused: bool = False):
    """Sharding tree for a TrainState: params/opt-state follow the GSPMD
    TP rules (replicated when tp=1), scalars replicated.

    ``tp_fused`` (head-sharded TP through the fused kernels,
    parallel/tp.py): params stay REPLICATED over 'model' — each Block
    dynamic-slices its local heads at the kernel boundary and the
    boundary custom-VJPs keep every gradient full+replicated, so the
    optimizer runs identically on all model shards."""
    repl = NamedSharding(mesh, P())

    return TrainState(
        params=(
            jax.tree_util.tree_map(lambda _: repl, state.params)
            if tp_fused
            else param_shardings(state.params, mesh)
        ),
        opt_state=jax.tree_util.tree_map(
            lambda _: repl, state.opt_state
        ),
        quant=jax.tree_util.tree_map(lambda _: repl, state.quant),
        iteration=repl,
    )


def make_train_step(
    loss_fn: Callable,
    tx,
    n_accum: int,
    mesh=None,
    state_sharding=None,
    batch_sharding=None,
    tp_fused: bool = False,
):
    """Build the jitted train step.

    Args:
      loss_fn: (params, quant, batch, rng) -> (loss, aux) where aux is
        {"metrics": dict} optionally plus {"quant": updated observer
        collection} (INT8 QAT updates its min/max observers every training
        step, like torch prepare_qat).  ``batch`` is one micro-batch (a
        pytree of arrays with leading local batch dim).
      tx: optax transformation (with injected learning_rate).
      n_accum: micro-batches per optimizer step.
      mesh/state_sharding/batch_sharding: SPMD placement; when omitted the
        step runs single-device.

    The returned function has signature
      (state, batch, lr, rng) -> (state, metrics)
    where batch leaves are [n_accum, local_batch, ...].

    ``MVT_NO_DONATE=1`` disables input-state donation: XLA:CPU
    mis-counts donated buffers when the step embeds the fori_loop-heavy
    device matcher ("Execution supplied N buffers but compiled program
    expected M" on the second call) — the flag trades ~the state's
    footprint in HBM for a working program there.  TPU keeps donation.
    """
    import inspect
    import os

    donate = () if os.environ.get("MVT_NO_DONATE") == "1" else (0,)
    # loss functions that need in-step collectives (detection's
    # cross-rank num_boxes average) declare an axis_name kwarg
    loss_takes_axis = (
        "axis_name" in inspect.signature(loss_fn).parameters
    )

    def step(state: TrainState, batch, lr, rng, axis_name=None):
        opt_state = set_learning_rate(state.opt_state, lr)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def micro(carry, mb):
            grads, metrics_sum, quant = carry
            mrng = jax.random.fold_in(rng, mb["_accum_index"])
            if axis_name is not None:
                mrng = jax.random.fold_in(
                    mrng, jax.lax.axis_index(axis_name)
                )
            kw = (
                {"axis_name": axis_name} if loss_takes_axis else {}
            )
            (loss, aux), g = grad_fn(state.params, quant, mb, mrng, **kw)
            if "quant" in aux:
                quant = aux["quant"]
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
            metrics = {**aux["metrics"], "loss": loss}
            metrics_sum = jax.tree_util.tree_map(
                jnp.add, metrics_sum, metrics
            )
            return (grads, metrics_sum, quant), None

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        # probe metrics structure with a shape-only eval at trace time
        batch = dict(batch)
        batch["_accum_index"] = jnp.arange(n_accum, dtype=jnp.int32)
        probe = jax.eval_shape(
            lambda: loss_fn(
                state.params,
                state.quant,
                jax.tree_util.tree_map(lambda x: x[0], batch),
                rng,
            )
        )
        zero_metrics = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), probe[1]["metrics"]
        )
        zero_metrics["loss"] = jnp.zeros((), jnp.float32)

        (grads, metrics_sum, quant), _ = jax.lax.scan(
            micro, (zero_grads, zero_metrics, state.quant), batch
        )
        # gradients stay SUMMED over accumulation steps (reference parity);
        # metrics are reported as per-micro-batch means
        metrics = jax.tree_util.tree_map(
            lambda m: m / n_accum, metrics_sum
        )

        if axis_name is not None:
            # the DDP all-reduce, explicit under shard_map: grads and
            # metrics average over the data axis; INT8 observer min/max
            # reduce with pmin/pmax
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)

            def reduce_quant(path, leaf):
                name = str(getattr(path[-1], "key", ""))
                if name == "min":
                    return jax.lax.pmin(leaf, axis_name)
                if name == "max":
                    return jax.lax.pmax(leaf, axis_name)
                return leaf

            quant = jax.tree_util.tree_map_with_path(reduce_quant, quant)

        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype),
            state.params,
            updates,
        )
        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            quant=quant,
            iteration=state.iteration + 1,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=donate)

    n_tp = mesh.devices.shape[1]
    if n_tp == 1 or tp_fused:
        # Pure data parallel, or head-sharded tensor parallelism through
        # the fused kernels: run the step under shard_map so the Pallas
        # block kernels execute on LOCAL batch shards.  (Under plain GSPMD
        # jit, XLA cannot partition an opaque custom call and all-gathers
        # the full batch onto every device — correct but redundant.)
        # With ``tp_fused`` the loss_fn's model carries tp_axis="model":
        # each Block slices its local heads and psums its partial output
        # over 'model' (parallel/tp.py); params/grads stay replicated
        # over 'model', so the step body needs no model-axis handling.
        import functools

        spec_of = lambda s: jax.tree_util.tree_map(  # noqa: E731
            lambda ns: ns.spec, s
        )
        sharded = jax.shard_map(
            functools.partial(step, axis_name="data"),
            mesh=mesh,
            in_specs=(
                spec_of(state_sharding),
                spec_of(batch_sharding),
                P(),
                P(),
            ),
            out_specs=(spec_of(state_sharding), P()),
            check_vma=False,
        )
        return jax.jit(
            sharded,
            in_shardings=(
                state_sharding,
                batch_sharding,
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P()),
            ),
            out_shardings=(state_sharding, NamedSharding(mesh, P())),
            donate_argnums=donate,
        )

    # tensor parallel: GSPMD partitions the matmuls across the model axis
    # (the Pallas fast path is bypassed per-op via gathers; TP shines with
    # the unfused path / larger models)
    return jax.jit(
        step,
        in_shardings=(
            state_sharding,
            batch_sharding,
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        ),
        out_shardings=(state_sharding, NamedSharding(mesh, P())),
        donate_argnums=donate,
    )


def make_eval_step(apply_fn, mesh=None, batch_sharding=None):
    """Jitted eval forward: (params, quant, batch) -> model output."""

    def step(params, quant, batch):
        return apply_fn(params, quant, batch)

    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        step,
        in_shardings=(None, None, batch_sharding),
        out_shardings=NamedSharding(mesh, P()),
    )


def shard_accum_batch(batch, n_accum, batch_size):
    """Reshape a host batch of [n_accum * batch, ...] leaves into
    [n_accum, batch, ...] for the scan."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_accum, batch_size) + x.shape[1:]), batch
    )
