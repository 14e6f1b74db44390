"""Distributed helpers: metric reduction, eval gathering, multi-host init.

TPU-native equivalents of the reference's torch.distributed utilities
(reference: src/myrtle_vision/utils/utils.py:128-240):

- Inside a jitted SPMD program there are no explicit collectives to call:
  reductions over the sharded batch dim ARE global (XLA inserts psum over
  ICI), which covers the reference's DDP grad all-reduce and the
  num_boxes all-reduce (detector.py:136-138).
- These helpers cover the HOST-side cases: merging per-process eval
  results (the reference's pickle all_gather, utils.py:153-193) and
  averaging metric dicts across processes (reduce_dict, utils.py:196-220)
  when running multi-host.
- ``initialize_multihost`` wires ``jax.distributed.initialize`` — the DCN
  analogue of the reference's ``init_distributed`` NCCL/TCP rendezvous
  (utils.py:128-143).  Single-host runs need none of this.
"""
from __future__ import annotations

import os
import pickle

import jax

import numpy as np


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Join a multi-host JAX runtime (DCN).  Reads MVT_COORDINATOR /
    MVT_NUM_PROCESSES / MVT_PROCESS_ID when args are omitted; no-op if
    neither args nor env are present (single-host)."""
    coordinator_address = coordinator_address or os.environ.get(
        "MVT_COORDINATOR"
    )
    if coordinator_address is None:
        return False
    num_processes = int(
        num_processes or os.environ.get("MVT_NUM_PROCESSES", 1)
    )
    process_id = int(process_id or os.environ.get("MVT_PROCESS_ID", 0))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def reduce_dict(metrics: dict, average: bool = True) -> dict:
    """Average (or sum) a dict of scalars across processes
    (reference utils/utils.py:196-220 — sorted keys for consistency)."""
    if jax.process_count() == 1:
        return metrics
    keys = sorted(metrics)
    values = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = all_gather_host(values)
    total = np.sum(np.stack(gathered), axis=0)
    if average:
        total = total / jax.process_count()
    return {k: float(v) for k, v in zip(keys, total)}


def all_gather_host(data):
    """Gather arbitrary picklable host data from every process
    (the reference's pickle-over-NCCL all_gather, utils.py:153-193; here
    pickle-over-ICI/DCN via a padded uint8 device all-gather)."""
    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64)
    ).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    stacked = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(stacked[i, : int(sizes[i])].tobytes())
        for i in range(jax.process_count())
    ]


def merge_coco_evaluators(evaluator):
    """Merge CocoEvaluator predictions across processes (the reference's
    synchronize_between_processes, datasets/coco_eval.py:66-69)."""
    if jax.process_count() == 1:
        return evaluator
    for preds in all_gather_host(evaluator.predictions):
        evaluator.update(preds)
    return evaluator
