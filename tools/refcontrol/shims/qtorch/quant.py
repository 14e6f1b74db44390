"""qtorch.quant shim: the Quantizer module the reference wraps in its
QuantizerFunction STE (reference quantize.py:77-118).

Numerics (bit-exact with myrtle_vision_tpu/ops/fake_quant.py):
  - FloatingPoint(5, 10): IEEE fp16 round-trip (RNE, subnormals) with
    saturation to +-65504 instead of overflow to inf.
  - FloatingPoint(8, 10): TF32 — RNE mantissa truncation to 10 bits in the
    float32 bit domain.
  - FixedPoint(wl, fl): clamp(rint(x * 2^fl) / 2^fl) to the two's-complement
    range [-2^(wl-fl-1), 2^(wl-fl-1) - 2^-fl].
"""
import torch

from . import FixedPoint, FloatingPoint


def float_quantize(x, exp, man, rounding="nearest"):
    assert rounding == "nearest", rounding
    if exp == 5 and man == 10:
        return torch.clamp(x.half().float(), -65504.0, 65504.0)
    if exp == 8:
        # same exponent range as fp32: pure RNE mantissa rounding
        shift = 23 - man
        bits = x.float().view(torch.int32)
        mask = (1 << shift) - 1
        halfway = 1 << (shift - 1)
        rem = bits & mask
        base = bits & ~mask
        lsb = (base >> shift) & 1
        round_up = (rem > halfway) | ((rem == halfway) & (lsb == 1))
        # keep int32: int64 promotion would make .view(float32) reinterpret
        # each element as TWO floats (doubling the last dim)
        incr = round_up.to(torch.int32) * (1 << shift)
        out = (base + incr).view(torch.float32)
        max_val = (2.0 - 2.0 ** (-man)) * 2.0 ** 127
        return torch.clamp(out, -max_val, max_val)
    raise NotImplementedError(f"FloatingPoint(exp={exp}, man={man})")


def fixed_point_quantize(x, wl, fl, rounding="nearest"):
    assert rounding == "nearest", rounding
    scale = 2.0 ** fl
    t_min = -(2.0 ** (wl - fl - 1))
    t_max = 2.0 ** (wl - fl - 1) - 2.0 ** (-fl)
    return torch.clamp(torch.round(x.float() * scale) / scale, t_min, t_max)


class Quantizer(torch.nn.Module):
    """Forward-only quantizer module (the reference wraps it in an STE
    autograd.Function, quantize.py:77-89, so no backward is needed here)."""

    def __init__(self, forward_number=None, forward_rounding="nearest"):
        super().__init__()
        self.forward_number = forward_number
        self.forward_rounding = forward_rounding

    def forward(self, x):
        n = self.forward_number
        if n is None:
            return x
        if isinstance(n, FloatingPoint):
            return float_quantize(x, n.exp, n.man, self.forward_rounding)
        if isinstance(n, FixedPoint):
            return fixed_point_quantize(
                x, n.wl, n.fl, self.forward_rounding
            )
        raise NotImplementedError(type(n))
