"""Functional qtorch shim (qtorch is not installable in this image).

Implements the two number-format descriptors the reference's quantize.py
constructs (FixedPoint, FloatingPoint — reference quantize.py:23-74) with
the semantics qtorch documents: round-to-nearest-even, gradual underflow,
saturating clamp.  The torch implementations here are bit-exact with this
framework's JAX/Pallas primitives (myrtle_vision_tpu/ops/fake_quant.py),
which tests/test_fake_quant.py pins against hand-computed edge vectors —
so a reference control run through this shim exercises the reference's
*interposition sites* with verified-identical numerics.
"""


class FixedPoint:
    def __init__(self, wl, fl):
        self.wl = wl
        self.fl = fl


class FloatingPoint:
    def __init__(self, exp, man):
        self.exp = exp
        self.man = man


from . import quant  # noqa: E402,F401
