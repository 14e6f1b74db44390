"""Device mesh + sharding layout for SPMD training.

TPU-native replacement for the reference's NCCL DistributedDataParallel
(reference: classification/train.py:156, utils/utils.py:128-147): one jitted
SPMD program over a ``jax.sharding.Mesh`` instead of one process per GPU.
XLA inserts the gradient all-reduce (riding ICI) where DDP registers NCCL
hooks; multi-host runs reuse the same program over DCN after
``jax.distributed.initialize``.

Mesh axes:
  - ``data``: batch (data parallel) — the reference's only strategy.
  - ``model``: tensor parallel (Megatron-style column/row sharding of the
    attention QKV / output and MLP fc1 / fc2 kernels). Beyond reference
    capability; defaults to 1.

The reference ``dist_config`` JSON schema ({"dist_backend", "dist_url"}) is
accepted and validated; backend/rendezvous are handled by the JAX runtime so
those fields are ignored. An optional ``tensor_parallel`` key extends the
schema.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    tensor_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % tensor_parallel != 0:
        raise ValueError(
            f"device count {n} not divisible by tensor_parallel="
            f"{tensor_parallel}"
        )
    arr = np.asarray(devices).reshape(n // tensor_parallel, tensor_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def mesh_from_dist_config(dist_config: Optional[dict], num_devices=None):
    """Map the reference dist_config onto a mesh (backend/url validated and
    ignored — rendezvous is the JAX runtime's job)."""
    tp = 1
    if dist_config:
        unknown = set(dist_config) - {
            "dist_backend",
            "dist_url",
            "group_name",
            "tensor_parallel",
        }
        if unknown:
            raise ValueError(f"unknown dist_config keys: {sorted(unknown)}")
        tp = int(dist_config.get("tensor_parallel", 1))
    return make_mesh(num_devices=num_devices, tensor_parallel=tp)


# Megatron-style tensor-parallel layout for the ViT param tree
# (path regex, PartitionSpec). First match wins; default replicated.
_TP_RULES = [
    # column-parallel: QKV and MLP up-projection split on the output feature
    (r".*attn/to_qkv/kernel$", P(None, "model")),
    (r".*attn/to_qkv/bias$", P("model")),
    (r".*ffn/fc1/kernel$", P(None, "model")),
    (r".*ffn/fc1/bias$", P("model")),
    # row-parallel: outputs reduce over the model axis
    (r".*attn/to_out/kernel$", P("model", None)),
    (r".*ffn/fc2/kernel$", P("model", None)),
]


def param_pspec(path: str) -> P:
    for pattern, spec in _TP_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "name", p))) for p in path
    )


def param_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for a param/opt-state tree: TP rules on matching
    kernels, replicated otherwise. Scalars/empty states stay replicated."""

    def to_sharding(path, leaf):
        spec = param_pspec(_path_str(path))
        if spec != P() and hasattr(leaf, "ndim"):
            # guard: only apply when the dims divide over the axis
            sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            ok = True
            for d, axis in enumerate(spec):
                if axis is None:
                    continue
                if d >= leaf.ndim or leaf.shape[d] % sizes[axis] != 0:
                    ok = False
            if not ok:
                spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis (grads then reduce over
    'data' automatically — the DDP all-reduce equivalent)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
