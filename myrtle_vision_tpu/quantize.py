"""Quantization subsystem: QAT / PTQ simulation of FPGA number formats.

Functional redesign of the reference's module-rewriting quantizer
(reference: src/myrtle_vision/utils/quantize.py).  Instead of mutating a
module tree with stubs/observers (torch ``prepare_qat``/``convert``), the
formats are expressed as a static (format, site) -> fake-quant mapping that
the flax model consults at the exact graph positions where the reference
inserts its stubs:

========== ===============================================================
site       reference analogue
========== ===============================================================
pre_linear QuantStub inserted before Linear/LayerNorm/GELU by
           ``_activation_pre_process`` (quantize.py:215-220, 253-327)
post_op    the module's qconfig ``activation`` observer applied to
           Linear/LayerNorm outputs (quantize.py:258-270)
functional torch.nn.quantized.FloatFunctional outputs: residual adds,
           token cats, pos-embedding add (vit.py:24, 259-261)
gelu_out   QGELU requant (quantize.py:169-184)
stub       top-level QuantStubs: image/pos/cls/det inputs, attention
           quant_out (vit.py:78-79, 254-258)
========== ===============================================================

Per-format active sites (derived from _prepare_qat_* in the reference):

- FP32:        nothing.
- FP16_16:     acts fp16 at pre_linear/post_op/functional/gelu_in/gelu_out;
               Linear weights fp16 during QAT; LayerNorm weights fp16 only
               after convert() (torch has no qat.LayerNorm, so the reference
               only bakes LN weights at convert — quantize.py:146-166).
- FP16_32:     acts fp16 at pre_linear only (fp32 accumulation); weights fp16.
- TF32:        acts tf32 at pre_linear only; weights tf32.
- PyTorchINT8: affine uint8 activations with running min/max observers at
               stub/post_op/functional/gelu_out; symmetric int8 weights for
               Linear layers.  The attention softmax core always runs fp32
               between the dequant_qkv / quant_out stubs (vit.py:78-97).

INT8 observer state lives in the flax ``"quant"`` variable collection
(min/max per site), updated when the model is applied with
``calibrating=True`` and ``mutable=["quant"]`` — the functional equivalent of
torch observers.  ``convert`` is a pure function over the param tree that
bakes weight fake-quant into the weights (reference quantize.py:329-348).
"""
from __future__ import annotations

import enum
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.ops import fake_quant as fq


class QFormat(enum.IntEnum):
    """Quantization formats supported by ViT (reference quantize.py:13-21)."""

    FP32 = 0
    PyTorchINT8 = 1
    FP16_16 = 2
    FP16_32 = 3
    TF32 = 4


class NumberFormat(enum.Enum):
    """Number formats the fake-quant primitives simulate
    (reference quantize.py:23-74)."""

    SymmetricInt8 = enum.auto()
    AsymmetricInt8 = enum.auto()
    HalfPrecisionFloat = enum.auto()
    SinglePrecisionFloat = enum.auto()
    TensorFloat32 = enum.auto()
    FixedPoint11Integral2 = enum.auto()
    FixedPoint11Integral3 = enum.auto()
    FixedPoint11Integral4 = enum.auto()

    def quantize(self, x):
        """Apply the format's fake-quant with an STE gradient."""
        if self == NumberFormat.HalfPrecisionFloat:
            return fq.float_quantize_ste(x, 5, 10)
        if self == NumberFormat.SinglePrecisionFloat:
            return x
        if self == NumberFormat.TensorFloat32:
            return fq.float_quantize_ste(x, 8, 10)
        if self == NumberFormat.FixedPoint11Integral2:
            return fq.fixed_point_quantize_ste(x, 11, 9)
        if self == NumberFormat.FixedPoint11Integral3:
            return fq.fixed_point_quantize_ste(x, 11, 8)
        if self == NumberFormat.FixedPoint11Integral4:
            return fq.fixed_point_quantize_ste(x, 11, 7)
        raise NotImplementedError(self)


# (q_format, site) -> NumberFormat | None for the stateless float formats.
_FP16 = NumberFormat.HalfPrecisionFloat
_TF32 = NumberFormat.TensorFloat32

_ACT_TABLE = {
    QFormat.FP32: {},
    QFormat.FP16_16: {
        "pre_linear": _FP16,
        "post_op": _FP16,
        "functional": _FP16,
        "gelu_in": _FP16,
        "gelu_out": _FP16,
    },
    QFormat.FP16_32: {"pre_linear": _FP16},
    QFormat.TF32: {"pre_linear": _TF32},
}

# Sites where PyTorchINT8 observes + fake-quantizes activations.
_INT8_ACT_SITES = frozenset({"stub", "post_op", "functional", "gelu_out"})


def act_number_format(q_format: QFormat, site: str) -> Optional[NumberFormat]:
    """Stateless activation format for a site (None = identity)."""
    return _ACT_TABLE.get(q_format, {}).get(site)


def weight_number_format(
    q_format: QFormat, kind: str, converted: bool
) -> Optional[NumberFormat]:
    """Weight fake-quant format for a parameter kind ('linear'|'norm').

    Linear weights are fake-quantized during QAT (torch qat.Linear's
    weight_fake_quant); LayerNorm weights only after convert()
    (reference quantize.py:146-166, 340-346).  INT8 weights are handled
    separately (observer-scaled symmetric int8).
    """
    if q_format == QFormat.FP16_16 or q_format == QFormat.FP16_32:
        fmt = _FP16
    elif q_format == QFormat.TF32:
        fmt = _TF32
    else:
        return None
    if kind == "linear" or (kind == "norm" and converted):
        return fmt
    return None


# --------------------------------------------------------------------------
# torch-compatible observer math (MinMaxObserver)
# --------------------------------------------------------------------------

def affine_uint8_qparams(min_val, max_val):
    """(scale, zero_point) for quint8 affine, reduce_range=False
    (torch MinMaxObserver semantics, reference quantize.py:242-244)."""
    min_v = jnp.minimum(min_val, 0.0)
    max_v = jnp.maximum(max_val, 0.0)
    scale = (max_v - min_v) / 255.0
    scale = jnp.maximum(scale, jnp.float32(1.1920929e-7))  # torch eps guard
    zero_point = jnp.clip(jnp.rint(-min_v / scale), 0.0, 255.0)
    return scale, zero_point


def symmetric_int8_scale(max_abs):
    """scale for qint8 per_tensor_symmetric (torch semantics)."""
    return jnp.maximum(max_abs / 127.5, jnp.float32(1.1920929e-7))


class ActQuant(nn.Module):
    """Activation fake-quant site.

    For the stateless float formats this is a pure function of the input.
    For PyTorchINT8 it keeps running min/max in the ``"quant"`` collection
    (updated when ``calibrating``) and applies affine uint8 fake-quant once
    statistics exist — the functional analogue of a torch observer +
    FakeQuantize pair.
    """

    q_format: QFormat
    site: str

    def setup(self):
        if (
            self.q_format == QFormat.PyTorchINT8
            and self.site in _INT8_ACT_SITES
        ):
            self.min_v = self.variable(
                "quant", "min", lambda: jnp.float32(np.inf)
            )
            self.max_v = self.variable(
                "quant", "max", lambda: jnp.float32(-np.inf)
            )

    def int8_qparams(self):
        """(scale, zero_point, has_stats) from the running observers."""
        has_stats = self.min_v.value <= self.max_v.value
        scale, zp = affine_uint8_qparams(self.min_v.value, self.max_v.value)
        return scale, zp, has_stats

    def quantize_to_int8(self, x):
        """Integer-side view of the affine uint8 quantization: returns
        ``(q - 128, scale, zero_point, has_stats)`` with ``q - 128`` an
        int8 array on the shifted grid.  Used by the converted-INT8
        integer matmul path (QDense) — same observers, same grid as the
        fake-quant simulation, but the quantized values stay integral so
        the dot can run on the MXU's int8 path.  Must only be called for
        ``PyTorchINT8`` at an observed site."""
        scale, zp, has_stats = self.int8_qparams()
        q = jnp.clip(
            jnp.rint(x.astype(jnp.float32) / scale) + zp, 0.0, 255.0
        )
        q_shifted = (q - 128.0).astype(jnp.int8)
        return q_shifted, scale, zp, has_stats

    def __call__(self, x, calibrating: bool = False):
        if self.q_format == QFormat.PyTorchINT8:
            if self.site not in _INT8_ACT_SITES:
                return x
            if calibrating and not self.is_initializing():
                xf = x.astype(jnp.float32)
                self.min_v.value = jnp.minimum(
                    self.min_v.value, jnp.min(xf)
                )
                self.max_v.value = jnp.maximum(
                    self.max_v.value, jnp.max(xf)
                )
            scale, zp, has_stats = self.int8_qparams()
            q = fq.int8_affine_fake_quant_ste(
                x.astype(jnp.float32), scale, zp
            ).astype(x.dtype)
            return jnp.where(has_stats, q, x)

        fmt = act_number_format(self.q_format, self.site)
        if fmt is None:
            return x
        return fmt.quantize(x.astype(jnp.float32)).astype(x.dtype)


def quantize_weight(w, q_format: QFormat, kind: str, converted: bool):
    """Apply weight fake-quant for a Linear ('linear') or LayerNorm ('norm')
    parameter. INT8 weights use a dynamic symmetric scale from the current
    weight range (torch qat weight observers re-observe every step)."""
    if q_format == QFormat.PyTorchINT8 and kind == "linear":
        scale = symmetric_int8_scale(jnp.max(jnp.abs(w.astype(jnp.float32))))
        return fq.int8_symmetric_fake_quant_ste(
            w.astype(jnp.float32), scale
        ).astype(w.dtype)
    fmt = weight_number_format(q_format, kind, converted)
    if fmt is None:
        return w
    return fmt.quantize(w.astype(jnp.float32)).astype(w.dtype)


# --------------------------------------------------------------------------
# convert(): bake weight quantization into the param tree
# --------------------------------------------------------------------------

def convert_params(params, q_format: QFormat):
    """Return a param tree with weight quantization made REAL — the
    functional equivalent of ``ModelQuantizer.convert`` +
    QLinear/QLayerNorm.from_float (reference quantize.py:121-166, 329-348),
    including the actual low-precision storage the reference's converted
    torch modules have:

    - PyTorchINT8: linear kernels stored as **int8** arrays with a
      per-tensor fp32 ``kernel_scale`` sibling (torch per_tensor_symmetric
      observer scale, reference quantize.py:243-246); the converted model
      dequantizes on use (numerically identical to the fake-quant
      simulation).
    - FP16_16 / FP16_32: linear kernels and LayerNorm weights stored as
      **float16** arrays (e5m10 fake-quant output is exactly representable,
      saturation included).
    - TF32: weights baked through the e8m10 fake-quant but kept in fp32
      containers — 19 significant bits do not fit 16 (torch stores TF32
      master weights as fp32 too).

    Apply the converted tree with a ``converted=True`` model so LayerNorm
    weights are not double-quantized and the INT8 ``kernel_scale`` params
    are declared.
    """
    from collections.abc import Mapping

    if q_format == QFormat.FP32:
        return params

    def walk(node):
        if not isinstance(node, Mapping):
            return node
        out = {}
        for key, value in node.items():
            if key == "kernel":
                w = np.asarray(value, np.float32)
                if q_format == QFormat.PyTorchINT8:
                    scale = np.maximum(
                        np.abs(w).max() / 127.5, np.float32(1.1920929e-7)
                    ).astype(np.float32)
                    q = np.clip(np.rint(w / scale), -128, 127).astype(
                        np.int8
                    )
                    out["kernel"] = q
                    out["kernel_scale"] = scale
                    continue
                baked = np.asarray(
                    quantize_weight(
                        jnp.asarray(w), q_format, "linear", converted=True
                    )
                )
                if q_format in (QFormat.FP16_16, QFormat.FP16_32):
                    baked = baked.astype(np.float16)
                out["kernel"] = baked
            elif key == "scale" and not isinstance(value, Mapping):
                baked = np.asarray(
                    quantize_weight(
                        jnp.asarray(value, jnp.float32),
                        q_format,
                        "norm",
                        converted=True,
                    )
                )
                if q_format in (QFormat.FP16_16, QFormat.FP16_32):
                    baked = baked.astype(np.float16)
                out["scale"] = baked
            else:
                out[key] = walk(value)
        return out

    return walk(params)


def model_size_mb(variables, q_format: QFormat, converted: bool = False):
    """Serialized model size in MB (reference test_quantize.py:19-23
    reports torch.save size).

    After :func:`convert_params` the low-precision storage is real (int8 /
    float16 arrays), so this is simply the actual bytes of every leaf.
    TF32 weights deploy in 32-bit containers (19 significant bits), so the
    TF32 "converted size" staying at 4 bytes/weight is honest.
    """
    import jax

    total = 0
    for _, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        total += np.asarray(leaf).nbytes
    return total / 1e6
