"""Fake-quantization primitives for FPGA number-format simulation.

TPU-native replacement for the QPyTorch CUDA kernels the reference depends on
(reference: src/myrtle_vision/utils/quantize.py:23-89, qtorch FixedPoint /
FloatingPoint simulators).  All primitives take float32 input and return
float32 output constrained to the simulated format, with round-to-nearest-even
and saturating clamping, and come with straight-through-estimator gradients
(`*_ste` variants mirror QuantizerFunction, reference quantize.py:77-89).

Formats (reference quantize.py:46-74):
  - HalfPrecisionFloat  = float(exp=5,  man=10)  (IEEE fp16 incl. subnormals)
  - TensorFloat32       = float(exp=8,  man=10)
  - FixedPoint11Integral{2,3,4} = fixed(wl=11, fl={9,8,7})

Two implementations share the same numerics:
  - pure-jnp (default; XLA fuses these elementwise ops into neighbours)
  - a Pallas TPU kernel (`use_pallas=True` paths), the building block that the
    performance pass fuses into matmul epilogues.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# Core numerics (pure jnp; float32 in / float32 out)
# --------------------------------------------------------------------------

def _round_mantissa_rne(x: jax.Array, man_bits: int) -> jax.Array:
    """Round the float32 mantissa of ``x`` to ``man_bits`` bits, RNE.

    Works entirely in the float32 bit domain: clears the low
    ``23 - man_bits`` mantissa bits, rounding to nearest with ties to even.
    Carries into the exponent are handled naturally by integer addition.
    """
    shift = 23 - man_bits
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    mask = jnp.uint32((1 << shift) - 1)
    halfway = jnp.uint32(1 << (shift - 1))
    rem = bits & mask
    base = bits & ~mask
    lsb = (base >> shift) & jnp.uint32(1)
    round_up = (rem > halfway) | ((rem == halfway) & (lsb == jnp.uint32(1)))
    rounded = base + jnp.where(round_up, jnp.uint32(1 << shift), jnp.uint32(0))
    return jax.lax.bitcast_convert_type(rounded, jnp.float32)


def float_quantize(x: jax.Array, exp_bits: int, man_bits: int) -> jax.Array:
    """Quantize float32 to a float(exp_bits, man_bits) format.

    Round-to-nearest-even, gradual underflow (subnormals) and saturation to
    the max finite value (no infs), matching qtorch's FloatingPoint
    simulation used by the reference (quantize.py:46-57).
    """
    x = x.astype(jnp.float32)
    min_exp = -(2 ** (exp_bits - 1) - 2)  # e.g. -14 for e5
    max_exp = 2 ** (exp_bits - 1) - 1  # e.g. +15 for e5
    max_val = jnp.float32((2.0 - 2.0 ** (-man_bits)) * 2.0 ** max_exp)

    y = _round_mantissa_rne(x, man_bits)

    if exp_bits < 8:
        # subnormal region: fixed quantum 2^(min_exp - man_bits)
        sub_step = jnp.float32(2.0 ** (min_exp - man_bits))
        y_sub = jnp.rint(x / sub_step) * sub_step
        y = jnp.where(jnp.abs(x) < jnp.float32(2.0 ** min_exp), y_sub, y)
    return jnp.clip(y, -max_val, max_val)


def fixed_point_quantize(x: jax.Array, wl: int, fl: int) -> jax.Array:
    """Quantize float32 to signed fixed-point with word length ``wl`` and
    fractional length ``fl`` (two's complement, asymmetric clamp), nearest
    rounding — qtorch FixedPoint semantics (reference quantize.py:58-72).

    Representable range: [-2^(wl-fl-1), 2^(wl-fl-1) - 2^-fl].
    """
    x = x.astype(jnp.float32)
    scale = jnp.float32(2.0 ** fl)
    t_min = jnp.float32(-(2.0 ** (wl - fl - 1)))
    t_max = jnp.float32(2.0 ** (wl - fl - 1) - 2.0 ** (-fl))
    return jnp.clip(jnp.rint(x * scale) / scale, t_min, t_max)


def int8_affine_fake_quant(x, scale, zero_point):
    """uint8 affine fake-quant (torch MinMaxObserver / quint8 semantics,
    used for PyTorchINT8 activations — reference quantize.py:242-248)."""
    q = jnp.clip(jnp.rint(x / scale) + zero_point, 0.0, 255.0)
    return (q - zero_point) * scale


def int8_symmetric_fake_quant(x, scale):
    """qint8 symmetric per-tensor fake-quant (torch per_tensor_symmetric,
    used for PyTorchINT8 weights — reference quantize.py:245-248)."""
    q = jnp.clip(jnp.rint(x / scale), -128.0, 127.0)
    return q * scale


# --------------------------------------------------------------------------
# Pallas TPU kernels (same numerics, explicit VMEM elementwise kernels)
# --------------------------------------------------------------------------

_LANES = 128
_SUBLANES = 8


def _pad_to_2d(x):
    """Flatten to (rows, 128) padding the tail; returns (x2d, orig_shape)."""
    shape = x.shape
    flat = x.reshape(-1)
    n = flat.shape[0]
    cols = _LANES
    rows = -(-n // cols)
    rows_pad = -(-rows // _SUBLANES) * _SUBLANES
    flat = jnp.pad(flat, (0, rows_pad * cols - n))
    return flat.reshape(rows_pad, cols), shape, n


def _unpad_from_2d(y2d, shape, n):
    return y2d.reshape(-1)[:n].reshape(shape)


def _fixed_point_kernel(wl, fl, x_ref, o_ref):
    o_ref[:] = fixed_point_quantize(x_ref[:], wl, fl)


def _float_kernel(exp_bits, man_bits, x_ref, o_ref):
    o_ref[:] = float_quantize(x_ref[:], exp_bits, man_bits)


def _elementwise_pallas(kernel, x):
    x2d, shape, n = _pad_to_2d(x.astype(jnp.float32))
    y2d = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # CPU (tests) only supports the Pallas interpreter
        interpret=(jax.default_backend() == "cpu"),
    )(x2d)
    return _unpad_from_2d(y2d, shape, n)


def fixed_point_quantize_pallas(x, wl: int, fl: int):
    """Pallas-kernel version of :func:`fixed_point_quantize`."""
    return _elementwise_pallas(functools.partial(_fixed_point_kernel, wl, fl), x)


def float_quantize_pallas(x, exp_bits: int, man_bits: int):
    """Pallas-kernel version of :func:`float_quantize`."""
    return _elementwise_pallas(
        functools.partial(_float_kernel, exp_bits, man_bits), x
    )


# --------------------------------------------------------------------------
# Straight-through estimators (reference QuantizerFunction, quantize.py:77-89)
# --------------------------------------------------------------------------

def _make_ste(fn):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
    def quant(x, a, b):
        return fn(x, a, b)

    def fwd(x, a, b):
        return fn(x, a, b), None

    def bwd(a, b, _, g):
        return (g,)

    quant.defvjp(fwd, bwd)
    return quant


fixed_point_quantize_ste = _make_ste(fixed_point_quantize)
float_quantize_ste = _make_ste(float_quantize)


@jax.custom_vjp
def _int8_affine_ste(x, scale, zero_point):
    return int8_affine_fake_quant(x, scale, zero_point)


def _int8_affine_fwd(x, scale, zero_point):
    return int8_affine_fake_quant(x, scale, zero_point), None


def _int8_affine_bwd(_, g):
    return g, None, None


_int8_affine_ste.defvjp(_int8_affine_fwd, _int8_affine_bwd)
int8_affine_fake_quant_ste = _int8_affine_ste


@jax.custom_vjp
def _int8_symmetric_ste(x, scale):
    return int8_symmetric_fake_quant(x, scale)


def _int8_symmetric_fwd(x, scale):
    return int8_symmetric_fake_quant(x, scale), None


def _int8_symmetric_bwd(_, g):
    return g, None


_int8_symmetric_ste.defvjp(_int8_symmetric_fwd, _int8_symmetric_bwd)
int8_symmetric_fake_quant_ste = _int8_symmetric_ste


# In-kernel site helpers shared by BOTH fused block kernels
# (ops/fused_attention_block.py, ops/fused_mlp.py) — single-sourced so
# the bit-identity guarantee between the fused and discrete-site paths
# (tests/test_golden_values.py::TestFusedQuantBitIdentity) cannot drift
# per kernel.  ``qspec`` is the static (exp_bits, man_bits, all_sites)
# of a stateless float format, or None for FP32.  No STE needed
# in-kernel: the sites sit inside custom-VJP kernels whose backward
# already treats them as straight-through.

def snap(x, qspec):
    """pre_linear-site snap (all stateless float formats; PyTorchINT8
    has no pre_linear activation sites — _INT8_ACT_SITES)."""
    if qspec is None or qspec == "int8":
        return x
    return float_quantize(x, qspec[0], qspec[1])


def snap_all(x, qspec):
    """post_op/functional/gelu-site snap (all-sites formats, FP16_16).
    PyTorchINT8's stateful sites are handled by :func:`snap_int8`."""
    if qspec is None or qspec == "int8" or not qspec[2]:
        return x
    return float_quantize(x, qspec[0], qspec[1])


def snap_int8(x, qspec, qs_ref, idx):
    """PyTorchINT8 observer-site fake-quant inside the fused block
    kernels (``qspec == "int8"``): the affine uint8 snap of
    :func:`int8_affine_fake_quant` with the site's frozen
    ``(scale, zero_point, has_stats)`` scalars read from the SMEM ref
    ``qs_ref`` (row ``idx``).  Bit-identical to ActQuant's
    calibrating=False application (models/vit.py) given the same
    qparams: same true divide, rint, clip and where-gate.  No STE
    needed in-kernel — the sites sit inside custom-VJP kernels whose
    backward already treats them as straight-through (the trainer's
    two-pass INT8 QAT step stops gradients at the qparams, exactly
    like the discrete path's zero-cotangent STE)."""
    if qspec != "int8":
        return x
    scale = qs_ref[idx, 0]
    zp = qs_ref[idx, 1]
    has = qs_ref[idx, 2]
    xf = x.astype(jnp.float32)
    q = jnp.clip(jnp.rint(xf / scale) + zp, 0.0, 255.0)
    return jnp.where(has > 0.0, (q - zp) * scale, xf)
