"""Host input pipeline: threaded decode/augment + device prefetch.

Replaces torch DataLoader + DistributedSampler (reference:
classification/train.py:116-132).  Because training is one SPMD program over
all devices (not one process per device), a single global loader feeds the
whole mesh: per optimizer step it assembles
``n_accum * global_batch`` samples, the trainer reshapes to
[n_accum, global_batch, ...], and jit shards the batch dim over the mesh's
data axis.

Design for TPU feeding:
  - a thread pool decodes/augments items (PIL/cv2 release the GIL);
  - batches are assembled into preallocated contiguous arrays;
  - ``prefetch_to_device`` keeps N batches in flight with async H2D
    transfers so the MXU never waits on the host.

Shuffling matches DistributedSampler semantics: a permutation seeded by
(seed, epoch) (reference train.py:196-200 set_epoch), drop_last drops the
trailing partial step (static shapes — no recompiles).
"""
from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import jax
import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch_batches: int = 2,
        collate_fn=None,
        pad_last: bool = False,
        process_shard=None,
        accum_steps: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # pad_last=True pads the ragged final batch (drop_last=False) up to
        # batch_size by repeating the last item and tags the batch with
        # "_n_valid" so consumers can mask — eval then compiles ONE shape
        # instead of paying an extra XLA compile for the tail shape.
        self.pad_last = pad_last
        # process_shard=(process_index, process_count) makes this loader a
        # MULTI-HOST feeder: every process computes the identical global
        # permutation (same seed), then decodes ONLY its contiguous block
        # of each global micro-batch — the multi-host analogue of the
        # reference's DistributedSampler (classification/train.py:116).
        # ``accum_steps`` gives the grad-accumulation layout: a batch of
        # ``batch_size`` indices is (accum_steps, batch_size/accum_steps)
        # and each process owns columns [p*l, (p+1)*l) of every row, so
        # the rows each process yields land exactly where the mesh's
        # process-major device order expects them
        # (jax.make_array_from_process_local_data in prefetch_to_device).
        if process_shard is not None:
            pid, pcount = process_shard
            if pcount > 1 and not drop_last:
                raise ValueError(
                    "process_shard requires drop_last=True (a ragged "
                    "final batch cannot be evenly sharded over processes)"
                )
            if pad_last:
                # the shard branch recomputes n_valid AFTER padding, so
                # combining them would tag pad duplicates as valid and
                # inflate eval metrics — reject rather than miscount
                raise ValueError(
                    "pad_last is incompatible with process_shard; "
                    "shard-evaluate with drop_last or evaluate on one "
                    "process"
                )
            micro = batch_size // accum_steps
            if batch_size % accum_steps or micro % pcount:
                raise ValueError(
                    f"batch_size {batch_size} must split into "
                    f"accum_steps={accum_steps} x process-divisible "
                    f"micro-batches (processes={pcount})"
                )
        self.process_shard = process_shard
        self.accum_steps = accum_steps
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = prefetch_batches
        self.collate_fn = collate_fn or _collate

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            return rng.permutation(n)
        return np.arange(n)

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        """Yield collated numpy batches for one epoch."""
        order = self._order(epoch)
        n_batches = len(self)
        item_seed = (self.seed * 100003 + epoch) & 0x7FFFFFFF

        def fetch(idx: int):
            rng = np.random.default_rng((item_seed, int(idx)))
            item = self.dataset.__getitem__(int(idx), rng=rng)
            return item

        with ThreadPoolExecutor(self.num_workers) as pool:
            # pipeline batches: submit ahead, collect in order
            pending = collections.deque()
            ahead = self.prefetch_batches + 1

            def submit(b):
                lo = b * self.batch_size
                hi = min(lo + self.batch_size, len(order))
                # drop_last=False emits a ragged final batch (torch
                # semantics) unless pad_last repeats the final item up to
                # batch_size (one compiled shape; consumers mask via
                # "_n_valid")
                idxs = order[lo:hi]
                n_valid = len(idxs)
                if self.pad_last and n_valid < self.batch_size:
                    idxs = np.concatenate(
                        [idxs, np.repeat(idxs[-1], self.batch_size - n_valid)]
                    )
                if self.process_shard is not None:
                    pid, pcount = self.process_shard
                    local = len(idxs) // self.accum_steps // pcount
                    idxs = idxs.reshape(self.accum_steps, -1)[
                        :, pid * local:(pid + 1) * local
                    ].reshape(-1)
                    n_valid = len(idxs)
                pending.append(
                    (n_valid, [pool.submit(fetch, i) for i in idxs])
                )

            for b in range(min(ahead, n_batches)):
                submit(b)
            for b in range(n_batches):
                n_valid, futures = pending.popleft()
                if b + ahead < n_batches:
                    submit(b + ahead)
                items = [f.result() for f in futures]
                batch = self.collate_fn(items)
                if self.pad_last:
                    batch["_n_valid"] = n_valid
                yield batch


def _collate(items):
    out = {}
    for key in items[0]:
        out[key] = np.stack([it[key] for it in items])
    return out


def shard_host_batch(batch, sharding):
    """Transfer a host batch to device under ``sharding``.

    Multi-process: each process holds only its LOCAL rows (DataLoader
    process_shard); assemble the global sharded array from the
    per-process blocks — device_put of a host-local array with a
    multi-process sharding is not addressable."""
    if sharding is None:
        return jax.device_put(batch)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda leaf, shard: jax.make_array_from_process_local_data(
                shard, np.asarray(leaf)
            ),
            batch,
            sharding,
        )
    return jax.device_put(batch, sharding)


def prefetch_to_device(
    iterator, sharding=None, reshape=None, size: int = 2
):
    """Wrap a host batch iterator with a background thread that stages the
    next ``size`` batches on device (async H2D over PCIe while the TPU
    computes). ``reshape`` optionally maps the host batch (e.g. adding the
    accumulation dim) before transfer."""
    q: queue.Queue = queue.Queue(maxsize=size)
    END = object()

    def put(batch):
        return shard_host_batch(batch, sharding)

    def producer():
        try:
            for batch in iterator:
                if reshape is not None:
                    batch = reshape(batch)
                q.put(put(batch))
        except BaseException as e:  # surface worker errors to the consumer
            q.put(e)
            return
        q.put(END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
