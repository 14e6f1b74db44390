"""Head-sharded tensor parallelism through the fused Pallas kernels.

Megatron-style TP (reference has none — this extends the reference's
DDP-only scaling, SURVEY §5.8) executed under ``shard_map`` so the fused
block kernels (ops/fused_attention_block.py, ops/fused_mlp.py) run on
LOCAL head/hidden slices instead of being bypassed by GSPMD gathers:

  - params stay REPLICATED over the 'model' axis (storage and optimizer
    run identically on every model shard); each Block dynamic-slices its
    local heads / hidden columns at the kernel boundary, so the MXU work
    and the attention working set split n_tp ways while the checkpoint
    schema stays exactly the reference's,
  - the kernel computes the PARTIAL block output with the residual and
    output-projection bias pre-scaled by 1/n_tp (``res_scale``); a psum
    over 'model' reassembles x + proj + bias,
  - autodiff is controlled explicitly (check_vma=False): the two
    custom-VJP boundary functions below make every gradient FULL and
    REPLICATED over 'model', so the optimizer needs no model-axis
    reduction anywhere.

Boundary functions (the Megatron f/g pair):
  ``replicated_in``  — identity forward, psum backward.  Wrap every
    value that enters a shard-local computation REPLICATED (the block
    input x and the full weight tensors before slicing): each shard's
    cotangent is only its own partial contribution (its local heads, or
    a zero-padded weight slice), and the psum reassembles the full
    gradient on every shard.
  ``partial_out`` — psum forward, identity backward.  Reduces the
    shards' partial block outputs; the incoming cotangent is already
    replicated, and each shard needs exactly that.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def replicated_in(x, axis: str):
    """Identity fwd; psum over ``axis`` in bwd (full+replicated grads)."""
    return x


def _rin_fwd(x, axis):
    return x, None


def _rin_bwd(axis, _, ct):
    return (lax.psum(ct, axis),)


replicated_in.defvjp(_rin_fwd, _rin_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def partial_out(x, axis: str):
    """psum over ``axis`` fwd; identity bwd (cotangent is replicated)."""
    return lax.psum(x, axis)


def _pout_fwd(x, axis):
    return lax.psum(x, axis), None


def _pout_bwd(axis, _, ct):
    return (ct,)


partial_out.defvjp(_pout_fwd, _pout_bwd)


def tp_size(axis: str) -> int:
    """Static size of the named mesh axis (inside shard_map)."""
    return lax.axis_size(axis)


def shard_cols(w, idx, n_shards: int, n_sections: int = 1):
    """Local column block ``idx`` of ``w`` (..., F) where the last axis
    is ``n_sections`` equal sections each sharded into ``n_shards``
    blocks (n_sections=3 slices the fused [q|k|v] projection so the
    local layout stays [q_loc|k_loc|v_loc])."""
    sec = w.shape[-1] // n_sections
    cl = sec // n_shards
    parts = [
        lax.dynamic_slice_in_dim(w, s * sec + idx * cl, cl, axis=w.ndim - 1)
        for s in range(n_sections)
    ]
    return parts[0] if n_sections == 1 else jnp.concatenate(parts, axis=-1)


def shard_rows(w, idx, n_shards: int):
    """Local row block ``idx`` of ``w`` (R, ...)."""
    rl = w.shape[0] // n_shards
    return lax.dynamic_slice_in_dim(w, idx * rl, rl, axis=0)


def fused_gate(vit, mesh, extra_ok: bool = True):
    """Trainer-side gate for the head-sharded fused-kernel TP path.

    Returns (tp_fused, train_model): the model cloned with
    ``tp_axis="model"`` when every condition holds, the original model
    otherwise (GSPMD TP fallback — gathers around the Pallas calls).
    Conditions mirror the Block-level ``fuse`` gate exactly — if the
    Blocks would run unfused, enabling tp_fused would silently
    degenerate to fully redundant compute on every model shard:
      - a model axis > 1; ``extra_ok`` for caller exclusions (e.g.
        distillation wraps the model, bypassing the Block fast path);
      - FP32 (the stateless quant formats snap the residual sum
        in-kernel — nonlinear over per-shard partial sums);
      - heads and MLP columns divisible by the shard count;
      - dropout == 0 (the fused kernels have no dropout; training runs
        non-deterministic, so any dropout disables the Block fuse);
      - the attention working set fits the per-kernel VMEM ceiling at
        this model's TRAINING sequence length (``fuses_at`` — e.g.
        DIOR-scale 800px inputs take the flash path instead);
      - fusion not globally disabled (MVT_NO_FUSE).
    """
    import os

    from myrtle_vision_tpu.ops.fused_attention_block import fuses_at

    n_tp = mesh.devices.shape[1]
    seq = (vit.image_size // vit.patch_size) ** 2 + 1
    if vit.decoder == "detection":
        seq += vit.num_det_tokens
    tp_fused = (
        n_tp > 1
        and extra_ok
        and vit.q_format.name == "FP32"
        and vit.heads % n_tp == 0
        and vit.mlp_dim % n_tp == 0
        and vit.dropout == 0.0
        and fuses_at(seq, vit.heads, vit.dim // vit.heads)
        and os.environ.get("MVT_NO_FUSE") != "1"
    )
    if tp_fused:
        print(f"tensor parallel: fused-kernel head sharding (x{n_tp})")
        return True, vit.clone(tp_axis="model")
    return False, vit
