"""Vision Transformer backbone with three task decoders, in flax.

TPU-native re-design of the reference ViT
(reference: src/myrtle_vision/models/vit.py:164-396):

- One backbone, three interchangeable decoders selected by ``decoder``
  ("classification" | "segmentation" | "detection", vit.py:196-201).
- Patch extraction is a pure reshape (NOT a conv), matching the reference's
  reshape/permute patchify (vit.py:271-275); images are NHWC here (the
  natural TPU layout) with identical per-patch element ordering
  (patch_row, patch_col, channel) so timm conv weights import with the same
  (O,I,H,W) -> (O,(H,W,I)) permutation (reference utils/models.py:214-220).
- Positional embeddings are stored at the fixed 14x14+1 grid and bicubically
  interpolated on the fly to the actual patch grid, YOLOS-style
  (vit.py:216-218, 292-302), with a separate learned embedding for the
  detection tokens (vit.py:219).
- Quantization fake-quant sites are threaded through every layer at the
  positions where the reference inserts stubs/observers — see
  myrtle_vision_tpu/quantize.py for the site map.  The attention softmax
  core always runs fp32 (vit.py:78-97).
- Parameters are float32; activations use ``dtype`` (bfloat16 by default for
  FP32 training — native on TPU; forced to float32 when simulating a
  quantized format so the fake-quant numerics are exact).

Construction produces a pure ``apply(variables, img, ...)`` function + param
pytree for jit/pjit — there is no eager module graph to mutate (the
reference's quantizer rewires modules in-place; we don't need to).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from myrtle_vision_tpu.ops.attention import multi_head_attention
from myrtle_vision_tpu.ops.fused_attention_block import (
    fused_attention_block,
    fuses_at,
)
from myrtle_vision_tpu.ops.fused_mlp import fused_mlp_block
from myrtle_vision_tpu.parallel import tp as tp_lib
from myrtle_vision_tpu.ops.high_precision import matmul_high3
from myrtle_vision_tpu.ops.interpolate import resize_bicubic, resize_bilinear
from myrtle_vision_tpu.quantize import ActQuant, QFormat, quantize_weight

MIN_NUM_PATCHES = 16  # reference vit.py:14


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default init (kaiming_uniform(a=sqrt(5))) on an
    (in, out) kernel: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = fan_in ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_linear_bias_init(fan_in):
    bound = fan_in ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class QDense(nn.Module):
    """Linear layer with the reference's quantization sites attached:
    a pre-activation fake-quant stub, weight fake-quant, and the module's
    activation post-process (reference quantize.py:121-143, 215-220).

    Setup-style with explicit ``in_features`` so parents can read
    ``.kernel``/``.bias`` directly for fused Pallas kernels."""

    features: int
    in_features: int
    q_format: QFormat
    converted: bool = False
    use_bias: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel",
            _torch_linear_kernel_init,
            (self.in_features, self.features),
            jnp.float32,
        )
        if self.converted and self.q_format == QFormat.PyTorchINT8:
            # true int8 convert: the kernel is stored as int8 and
            # dequantized on use with this per-tensor scale
            # (reference quantize.py:329-348, torch quantized Linear)
            self.kernel_scale = self.param(
                "kernel_scale", nn.initializers.ones, (), jnp.float32
            )
        if self.use_bias:
            self.bias = self.param(
                "bias",
                _torch_linear_bias_init(self.in_features),
                (self.features,),
                jnp.float32,
            )
        self.act_in = ActQuant(self.q_format, "pre_linear", name="act_in")
        self.act_out = ActQuant(self.q_format, "post_op", name="act_out")

    def _int8_forward(self, x, in_qparams):
        """True integer inference for the converted PyTorchINT8 model.

        ``x`` arrives from its producer (a stub/post_op/gelu_out
        observer) already ON that observer's affine uint8 grid, so
        ``rint(x/s) + zp`` recovers the integers exactly (values of the
        form (q-zp)*s reconstruct losslessly at fp32).  The dot then
        runs as int8 x int8 -> int32 on the MXU (2x the bf16 peak on
        v5e) using the shifted-zero-point identity:

          y = s_x*s_w * sum_i (q_i - zp) * k8_ij
            = s_x*s_w * ( sum_i (q_i - 128)*k8_ij + (128 - zp)*colsum_j )

        with q-128 in int8 and colsum_j = sum_i k8_ij from the stored
        int8 kernel.  Numerically this is MORE exact than the fake-quant
        simulation (exact integer accumulation + one fp32 rescale), so
        converted-model outputs agree with the simulated PTQ pipeline to
        fp32 roundoff.  The reference's own INT8 convert crashes on its
        ViT (BASELINE.md row 3); this path is the deployment-grade
        integer execution it intended to have."""
        s_x, zp, has_stats = in_qparams

        def integer_path(_):
            q = jnp.clip(
                jnp.rint(x.astype(jnp.float32) / s_x) + zp, 0.0, 255.0
            )
            q8 = (q - 128.0).astype(jnp.int8)
            acc = jax.lax.dot_general(
                q8, self.kernel,
                dimension_numbers=(((q8.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            colsum = jnp.sum(
                self.kernel.astype(jnp.int32), axis=0
            ).astype(jnp.float32)
            return (s_x * self.kernel_scale) * (
                acc + (128.0 - zp) * colsum
            )

        def fallback(_):
            # no observer statistics: the simulation path would pass x
            # through unquantized (ActQuant's has_stats guard)
            kernel = self.kernel.astype(jnp.float32) * self.kernel_scale
            return matmul_high3(x.astype(jnp.float32), kernel)

        y = jax.lax.cond(has_stats, integer_path, fallback, None)
        if self.use_bias:
            y = y + self.bias
        return self.act_out(y.astype(self.dtype), False)

    def __call__(self, x, calibrating: bool = False, in_qparams=None):
        if (
            self.converted
            and self.q_format == QFormat.PyTorchINT8
            and in_qparams is not None
        ):
            # int8 storage AND int8 compute (MXU integer path); callers
            # pass the producing observer's qparams where the input is
            # known to sit on an affine uint8 grid
            return self._int8_forward(x, in_qparams)
        x = self.act_in(x, calibrating)
        if self.converted and self.q_format == QFormat.PyTorchINT8:
            # dequantize-on-use (int8 storage, fp32 compute): used where
            # no producer grid is available (detection head tokens)
            kernel = self.kernel.astype(jnp.float32) * self.kernel_scale
        else:
            kernel = quantize_weight(
                self.kernel, self.q_format, "linear", self.converted
            )
        # quantized-format simulation runs fp32 activations; TPU fp32
        # dots default to ONE bf16 MXU pass, which would crush the
        # fake-quantized fp16/int8-grid values.  The 3-pass bf16
        # decomposition (ops/high_precision.py) keeps fp16/tf32-snapped
        # operands exactly represented, matches the fp32 attention core
        # (ops/attention.py), and is the SAME function the fused Pallas
        # quant kernels run — so the two paths are bit-identical by
        # construction (HIGHEST's 6 passes measured 691 img/s train).
        # PyTorchINT8 EVAL keeps HIGHEST: its simulation is the reference
        # the converted integer path (exact int32 accumulation) is
        # tested against at 1e-5, and the 3-pass dropped cross-term is
        # enough to flip a requant rounding step (one int8 grid step on
        # the logits).  The QAT TRAINING forward (``calibrating=True`` —
        # observers updating every step, training/classification.py:27-31)
        # runs the 3-pass HIGH decomposition instead: HIGHEST costs ~6 MXU
        # passes vs HIGH's 3, a hard 2x on the dot-dominated QAT step, and
        # a dropped ~2^-24-relative cross term under STOCHASTIC training
        # is noise (the eval/PTQ-parity comparisons all run
        # calibrating=False and are unaffected; observer min/max stats
        # shift by at most the same 2^-24 relative term).
        if self.q_format == QFormat.PyTorchINT8:
            if calibrating:
                y = matmul_high3(
                    x.astype(self.dtype), kernel.astype(self.dtype)
                ).astype(self.dtype)
            else:
                y = jnp.dot(
                    x.astype(self.dtype),
                    kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(self.dtype)
        elif self.q_format != QFormat.FP32:
            y = matmul_high3(
                x.astype(self.dtype), kernel.astype(self.dtype)
            ).astype(self.dtype)
        else:
            y = jnp.dot(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        if self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return self.act_out(y, calibrating)


class QLayerNorm(nn.Module):
    """LayerNorm with pre-activation stub and post-op observer; the weight is
    fake-quantized only after convert() (torch has no qat.LayerNorm —
    reference quantize.py:146-166).  Setup-style so parents can read
    ``.scale_p``/``.bias_p`` for fused kernels."""

    dim: int
    q_format: QFormat
    converted: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.scale_p = self.param(
            "scale", nn.initializers.ones, (self.dim,), jnp.float32
        )
        self.bias_p = self.param(
            "bias", nn.initializers.zeros, (self.dim,), jnp.float32
        )
        self.act_in = ActQuant(self.q_format, "pre_linear", name="act_in")
        self.act_out = ActQuant(self.q_format, "post_op", name="act_out")

    def out_qparams(self):
        """The post_op observer's (scale, zero_point, has_stats) — the
        affine uint8 grid this module's output sits on in converted
        PyTorchINT8 mode (consumed by QDense's integer path)."""
        return self.act_out.int8_qparams()

    def __call__(self, x, calibrating: bool = False):
        x = self.act_in(x, calibrating)
        scale = quantize_weight(
            self.scale_p, self.q_format, "norm", self.converted
        )
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)  # torch eps=1e-5
        y = (y * scale + self.bias_p).astype(self.dtype)
        return self.act_out(y, calibrating)


class QGelu(nn.Module):
    """Exact (erf) GELU with the reference's dequant/requant boundary
    (reference quantize.py:169-184; torch nn.GELU is exact, not tanh)."""

    q_format: QFormat

    def setup(self):
        self.act_in = ActQuant(self.q_format, "gelu_in")
        self.act_out = ActQuant(self.q_format, "gelu_out")

    def out_qparams(self):
        """The gelu_out observer's grid (see QLayerNorm.out_qparams)."""
        return self.act_out.int8_qparams()

    def __call__(self, x, calibrating: bool = False):
        x = self.act_in(x, calibrating)
        if self.q_format in (QFormat.FP16_16, QFormat.FP16_32,
                             QFormat.TF32) or (
            self.q_format == QFormat.PyTorchINT8 and calibrating
        ):
            # the stateless quant formats share the exact-divide
            # polynomial-erf GELU with the fused Pallas kernels (which
            # have no erf lowering) so the fused and discrete-site paths
            # are bit-identical; the 1.5e-7 poly error is ~3 decades
            # below these formats' 11-bit mantissa resolution.  The
            # INT8 QAT TRAINING forward (calibrating=True) shares it
            # for the same fused/discrete bit-identity (the two-pass
            # fused step, Block.__call__); under stochastic training
            # the 1.5e-7 erf difference is noise — the same argument
            # as its HIGHEST->HIGH dot switch (QDense.__call__).  INT8
            # EVAL keeps the exact erf: that is the reference-parity
            # simulation PTQ row 3 was measured with.
            from myrtle_vision_tpu.ops.fused_mlp import gelu_erf_poly

            y = gelu_erf_poly(x.astype(jnp.float32))
        else:
            y = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        y = y.astype(x.dtype)
        return self.act_out(y, calibrating)


class FeedForward(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout (reference vit.py:44-56)."""

    dim: int
    hidden_dim: int
    q_format: QFormat
    converted: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.fc1 = QDense(
            self.hidden_dim, self.dim, self.q_format, self.converted,
            dtype=self.dtype, name="fc1",
        )
        self.gelu = QGelu(self.q_format, name="gelu")
        self.fc2 = QDense(
            self.dim, self.hidden_dim, self.q_format, self.converted,
            dtype=self.dtype, name="fc2",
        )
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, deterministic: bool = True, calibrating=False,
                 in_qparams=None):
        cint8 = self.converted and self.q_format == QFormat.PyTorchINT8
        x = self.fc1(x, calibrating, in_qparams=in_qparams)
        x = self.gelu(x, calibrating)
        x = self.drop(x, deterministic=deterministic)
        # fc2's input sits on the gelu_out observer grid — but only when
        # dropout is inactive (dropout rescaling leaves the grid)
        fc2_qp = (
            self.gelu.out_qparams()
            if cint8 and (deterministic or self.dropout == 0.0)
            else None
        )
        x = self.fc2(x, calibrating, in_qparams=fc2_qp)
        return self.drop(x, deterministic=deterministic)


class Attention(nn.Module):
    """Fused-QKV multi-head self-attention (reference vit.py:59-99).

    The QKV projection output is dequantized and the softmax/matmul core runs
    fp32; the result is requantized before the output projection — the exact
    quantization boundary of the reference (vit.py:78-79, 86, 97).
    """

    dim: int
    heads: int
    dim_head: int = 64
    dropout: float = 0.0
    q_format: QFormat = QFormat.FP32
    converted: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        inner_dim = self.dim_head * self.heads
        assert inner_dim == self.dim, (
            "attention inner dim must equal model dim (all reference configs "
            "satisfy heads * 64 == embed_dim)"
        )
        self.to_qkv = QDense(
            inner_dim * 3, self.dim, self.q_format, self.converted,
            dtype=self.dtype, name="to_qkv",
        )
        self.quant_out = ActQuant(self.q_format, "stub", name="quant_out")
        self.to_out = QDense(
            self.dim, inner_dim, self.q_format, self.converted,
            dtype=self.dtype, name="to_out",
        )
        self.drop = nn.Dropout(self.dropout)

    # raw params for the fused block kernel
    @property
    def to_qkv_kernel(self):
        return self.to_qkv.kernel

    @property
    def to_qkv_bias(self):
        return self.to_qkv.bias

    @property
    def to_out_kernel(self):
        return self.to_out.kernel

    @property
    def to_out_bias(self):
        return self.to_out.bias

    def __call__(
        self,
        x,
        deterministic: bool = True,
        calibrating: bool = False,
        capture_attention: bool = False,
        in_qparams=None,
    ):
        b, n, c = x.shape
        scale = self.dim_head ** -0.5
        cint8 = self.converted and self.q_format == QFormat.PyTorchINT8

        qkv = self.to_qkv(x, calibrating, in_qparams=in_qparams)
        # dequant boundary (reference vit.py:78,86): the core's softmax and
        # accumulations run fp32; under a quantized format the whole core
        # is fp32 (self.dtype is already float32 then)
        qkv = qkv.reshape(b, n, 3, self.heads, c // self.heads)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, b, h, n, d)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if capture_attention:
            out, probs = multi_head_attention(
                q, k, v, scale, impl="xla", return_probs=True
            )
            # analogue of the reference's attn_output Identity hook point
            # (vit.py:80-82,94)
            self.sow("intermediates", "attn_probs", probs)
        else:
            impl = self.attn_impl
            if impl == "auto" and self.q_format != QFormat.FP32:
                # quant-format simulation keeps the reference's exact fp32
                # einsum core (vit.py:92-96)
                impl = "xla"
            out = multi_head_attention(q, k, v, scale, impl=impl)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, c).astype(self.dtype)
        # requant boundary before the output projection (vit.py:79,97)
        out = self.quant_out(out, calibrating)
        out = self.to_out(
            out, calibrating,
            in_qparams=self.quant_out.int8_qparams() if cint8 else None,
        )
        return self.drop(out, deterministic=deterministic)


class ResidualAdd(nn.Module):
    """Residual add through a quantizable functional
    (reference vit.py:17-27, FloatFunctional).  Setup-style so the
    converted-INT8 fused path can read the observer grid
    (``out_qparams``) while keeping the ``res_add`` variable path."""

    q_format: QFormat

    def setup(self):
        self.res_add = ActQuant(self.q_format, "functional")

    def out_qparams(self):
        """The functional observer's (scale, zero_point, has_stats) —
        the affine uint8 grid the residual sum sits on in converted
        PyTorchINT8 mode (consumed by the fused INT8 block kernels)."""
        return self.res_add.int8_qparams()

    def __call__(self, fn_out, x, calibrating: bool = False):
        return self.res_add(fn_out + x, calibrating)


class Block(nn.Module):
    """Pre-norm transformer block:
    Residual(PreNorm(Attention)) + Residual(PreNorm(FeedForward))
    (reference vit.py:102-161)."""

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float
    q_format: QFormat
    converted: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # set under head-sharded tensor parallelism (parallel/tp.py): the
    # mesh axis name the block's fused kernels shard their heads /
    # hidden columns over (the caller must apply under shard_map)
    tp_axis: Optional[str] = None
    # the model's real layer count, for the residual-saving HBM budget
    # (ops/acts_policy.py); None -> reference-family fallback of 12
    model_depth: Optional[int] = None

    def setup(self):
        self.attn_norm = QLayerNorm(
            self.dim, self.q_format, self.converted, dtype=self.dtype,
            name="attn_norm",
        )
        self.attn = Attention(
            self.dim,
            self.heads,
            self.dim_head,
            self.dropout,
            self.q_format,
            self.converted,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )
        self.attn_res = ResidualAdd(self.q_format, name="attn_res")
        self.ffn_norm = QLayerNorm(
            self.dim, self.q_format, self.converted, dtype=self.dtype,
            name="ffn_norm",
        )
        self.ffn = FeedForward(
            self.dim,
            self.mlp_dim,
            self.q_format,
            self.converted,
            self.dropout,
            dtype=self.dtype,
            name="ffn",
        )
        self.ffn_res = ResidualAdd(self.q_format, name="ffn_res")

    def __call__(
        self,
        x,
        deterministic: bool = True,
        calibrating: bool = False,
        capture_attention: bool = False,
        int8_fused: bool = False,
    ):
        # Fast path: each block half is one Pallas kernel
        # (ops/fused_attention_block.py, ops/fused_mlp.py) — for FP32 and
        # for the STATELESS quant formats (FP16_16/FP16_32/TF32), whose
        # fake-quant snaps run in-kernel at the discrete-site positions
        # (bit-identical to the unfused composition).  PyTorchINT8
        # (stateful observers), attention capture, active dropout and
        # sequences too long for one image's attention working set to fit
        # in VMEM (detection eval at large scales) keep the discrete-site
        # composition, whose attention routes to the flash kernels.
        # MVT_NO_FUSE=1 forces the unfused path (diagnostics; combine
        # with JAX_DEFAULT_MATMUL_PRECISION=highest for true-fp32
        # training — TPU fp32 dots otherwise run single-pass bf16 on the
        # MXU).  Read at TRACE time: set it before the first jitted call.
        import os as _os
        _QSPECS = {
            QFormat.FP32: None,
            QFormat.FP16_16: (5, 10, True),
            QFormat.FP16_32: (5, 10, False),
            QFormat.TF32: (8, 10, False),
        }
        fuse = (
            self.q_format in _QSPECS
            and not capture_attention
            and _os.environ.get("MVT_NO_FUSE") != "1"
            and (self.dropout == 0.0 or deterministic)
            and fuses_at(x.shape[1], self.heads, self.dim_head)
        )
        qspec = _QSPECS.get(self.q_format)
        # converted-INT8 deployment inference: each block half is one
        # Pallas program with int8 MXU projections and in-VMEM requants
        # (ops/fused_int8_block.py); calibration, attention capture,
        # dropout, TP and long sequences keep the discrete-site
        # composition (QDense._int8_forward per projection)
        # Two-pass INT8 QAT training (training/classification.py): the
        # observer pass has already folded this batch into the running
        # min/max, so each site's grid is frozen for this differentiated
        # pass and both block halves run as single Pallas kernels with
        # the affine uint8 snaps in-kernel (fused_attention_block_i8 /
        # fused_mlp_block_i8) — bit-identical to the discrete
        # update-then-use composition (min/max updates are idempotent;
        # tests/test_fused_int8_qat.py).  Weight fake-quant stays
        # outside the kernels with its STE carrying the gradient.
        int8_qat_fuse = (
            int8_fused
            and self.q_format == QFormat.PyTorchINT8
            and not self.converted
            and not capture_attention
            and (self.dropout == 0.0 or deterministic)
            and _os.environ.get("MVT_NO_FUSE") != "1"
            and self.tp_axis is None
            and fuses_at(x.shape[1], self.heads, self.dim_head)
        )
        if int8_qat_fuse:
            from myrtle_vision_tpu.ops.fused_attention_block import (
                fused_attention_block_i8,
            )
            from myrtle_vision_tpu.ops.fused_mlp import (
                fused_mlp_block_i8,
            )

            def _qsw(w):
                return quantize_weight(
                    w, self.q_format, "linear", False
                ).astype(self.dtype)

            def _qs_rows(sites):
                return jnp.stack([
                    jnp.stack([
                        jnp.asarray(s, jnp.float32).reshape(()),
                        jnp.asarray(z, jnp.float32).reshape(()),
                        jnp.asarray(h, jnp.float32).reshape(()),
                    ])
                    for (s, z, h) in sites
                ])

            with jax.named_scope("transformer:attention"):
                x = fused_attention_block_i8(
                    x.astype(self.dtype),
                    self.attn_norm.scale_p.astype(self.dtype),
                    self.attn_norm.bias_p,
                    _qsw(self.attn.to_qkv_kernel),
                    self.attn.to_qkv_bias,
                    _qsw(self.attn.to_out_kernel),
                    self.attn.to_out_bias,
                    _qs_rows([
                        self.attn_norm.out_qparams(),
                        self.attn.to_qkv.act_out.int8_qparams(),
                        self.attn.quant_out.int8_qparams(),
                        self.attn.to_out.act_out.int8_qparams(),
                        self.attn_res.out_qparams(),
                    ]),
                    self.heads,
                    self.dim_head ** -0.5,
                    self.model_depth,
                )
            with jax.named_scope("transformer:feedforward"):
                x = fused_mlp_block_i8(
                    x,
                    self.ffn_norm.scale_p.astype(self.dtype),
                    self.ffn_norm.bias_p,
                    _qsw(self.ffn.fc1.kernel),
                    self.ffn.fc1.bias,
                    _qsw(self.ffn.fc2.kernel),
                    self.ffn.fc2.bias,
                    _qs_rows([
                        self.ffn_norm.out_qparams(),
                        self.ffn.fc1.act_out.int8_qparams(),
                        self.ffn.gelu.out_qparams(),
                        self.ffn.fc2.act_out.int8_qparams(),
                        self.ffn_res.out_qparams(),
                    ]),
                )
            return x
        int8_fuse = (
            self.converted
            and self.q_format == QFormat.PyTorchINT8
            and not capture_attention
            and not calibrating
            and (self.dropout == 0.0 or deterministic)
            and _os.environ.get("MVT_NO_FUSE") != "1"
            and _os.environ.get("MVT_INT8_FUSE") != "0"
            and self.tp_axis is None
            and fuses_at(x.shape[1], self.heads, self.dim_head)
        )
        if int8_fuse:
            from myrtle_vision_tpu.ops.fused_int8_block import (
                int8_attention_block,
                int8_mlp_block,
            )

            with jax.named_scope("transformer:attention"):
                x = int8_attention_block(
                    x,
                    self.attn_norm.scale_p,
                    self.attn_norm.bias_p,
                    self.attn.to_qkv.kernel,
                    self.attn.to_qkv.kernel_scale,
                    self.attn.to_qkv.bias,
                    self.attn.to_out.kernel,
                    self.attn.to_out.kernel_scale,
                    self.attn.to_out.bias,
                    sites=[
                        self.attn_norm.out_qparams(),
                        self.attn.to_qkv.act_out.int8_qparams(),
                        self.attn.quant_out.int8_qparams(),
                        self.attn.to_out.act_out.int8_qparams(),
                        self.attn_res.out_qparams(),
                    ],
                    heads=self.heads,
                    scale=self.dim_head ** -0.5,
                )
            with jax.named_scope("transformer:feedforward"):
                x = int8_mlp_block(
                    x,
                    self.ffn_norm.scale_p,
                    self.ffn_norm.bias_p,
                    self.ffn.fc1.kernel,
                    self.ffn.fc1.kernel_scale,
                    self.ffn.fc1.bias,
                    self.ffn.fc2.kernel,
                    self.ffn.fc2.kernel_scale,
                    self.ffn.fc2.bias,
                    sites=[
                        self.ffn_norm.out_qparams(),
                        self.ffn.fc1.act_out.int8_qparams(),
                        self.ffn.gelu.out_qparams(),
                        self.ffn.fc2.act_out.int8_qparams(),
                        self.ffn_res.out_qparams(),
                    ],
                )
            return x

        def _qw(w, kind):
            # converted stateless checkpoints store weights as REAL
            # fp16 arrays; cast to the compute dtype outside the
            # kernel (exact, matching the unfused QDense's
            # kernel.astype) so Mosaic refs stay fp32.  Shared by
            # the attention and MLP fused branches so their weight
            # quantization can never diverge.
            return quantize_weight(
                w, self.q_format, kind, self.converted
            ).astype(self.dtype)
        # head-sharded tensor parallelism through the fused kernels
        # (parallel/tp.py): FP32 only — the stateless quant formats snap
        # the residual sum in-kernel, which is nonlinear and cannot be
        # applied to per-shard partial sums
        ntp = 1
        if self.tp_axis is not None and fuse:
            ntp = tp_lib.tp_size(self.tp_axis)
        tp_fuse = (
            ntp > 1
            and qspec is None
            and self.heads % ntp == 0
            and self.mlp_dim % ntp == 0
        )
        with jax.named_scope("transformer:attention"):
            if fuse and tp_fuse:
                tp = self.tp_axis
                idx = jax.lax.axis_index(tp)
                inv = 1.0 / ntp
                part = fused_attention_block(
                    tp_lib.replicated_in(x.astype(self.dtype), tp),
                    tp_lib.replicated_in(
                        self.attn_norm.scale_p, tp
                    ).astype(self.dtype),
                    tp_lib.replicated_in(self.attn_norm.bias_p, tp),
                    tp_lib.shard_cols(
                        tp_lib.replicated_in(self.attn.to_qkv_kernel, tp),
                        idx, ntp, n_sections=3,
                    ).astype(self.dtype),
                    tp_lib.shard_cols(
                        tp_lib.replicated_in(self.attn.to_qkv_bias, tp),
                        idx, ntp, n_sections=3,
                    ),
                    tp_lib.shard_rows(
                        tp_lib.replicated_in(self.attn.to_out_kernel, tp),
                        idx, ntp,
                    ).astype(self.dtype),
                    tp_lib.replicated_in(self.attn.to_out_bias, tp) * inv,
                    self.heads // ntp,
                    self.dim_head ** -0.5,
                    qspec,
                    inv,
                    self.model_depth,
                )
                x = tp_lib.partial_out(part, tp)
            elif fuse:
                x = fused_attention_block(
                    x.astype(self.dtype),
                    _qw(self.attn_norm.scale_p, "norm"),
                    self.attn_norm.bias_p,
                    _qw(self.attn.to_qkv_kernel, "linear"),
                    self.attn.to_qkv_bias,
                    _qw(self.attn.to_out_kernel, "linear"),
                    self.attn.to_out_bias,
                    self.heads,
                    self.dim_head ** -0.5,
                    qspec,
                    1.0,
                    self.model_depth,
                )
            else:
                cint8 = (
                    self.converted
                    and self.q_format == QFormat.PyTorchINT8
                )
                y = self.attn_norm(x, calibrating)
                y = self.attn(
                    y, deterministic, calibrating, capture_attention,
                    in_qparams=(
                        self.attn_norm.out_qparams() if cint8 else None
                    ),
                )
                x = self.attn_res(y, x, calibrating)
        with jax.named_scope("transformer:feedforward"):
            # FP32 fast path: one Pallas kernel for
            # LN -> fc1 -> GELU -> fc2 -> +residual (ops/fused_mlp.py);
            # quant formats / active dropout keep the discrete sites
            if fuse and tp_fuse:
                tp = self.tp_axis
                idx = jax.lax.axis_index(tp)
                inv = 1.0 / ntp
                part = fused_mlp_block(
                    tp_lib.replicated_in(x.astype(self.dtype), tp),
                    tp_lib.replicated_in(
                        self.ffn_norm.scale_p, tp
                    ).astype(self.dtype),
                    tp_lib.replicated_in(self.ffn_norm.bias_p, tp),
                    tp_lib.shard_cols(
                        tp_lib.replicated_in(self.ffn.fc1.kernel, tp),
                        idx, ntp,
                    ).astype(self.dtype),
                    tp_lib.shard_cols(
                        tp_lib.replicated_in(self.ffn.fc1.bias, tp),
                        idx, ntp,
                    ),
                    tp_lib.shard_rows(
                        tp_lib.replicated_in(self.ffn.fc2.kernel, tp),
                        idx, ntp,
                    ).astype(self.dtype),
                    tp_lib.replicated_in(self.ffn.fc2.bias, tp) * inv,
                    qspec,
                    inv,
                )
                x = tp_lib.partial_out(part, tp)
            elif fuse:
                x = fused_mlp_block(
                    x.astype(self.dtype),
                    _qw(self.ffn_norm.scale_p, "norm"),
                    self.ffn_norm.bias_p,
                    _qw(self.ffn.fc1.kernel, "linear"),
                    self.ffn.fc1.bias,
                    _qw(self.ffn.fc2.kernel, "linear"),
                    self.ffn.fc2.bias,
                    qspec,
                )
            else:
                cint8 = (
                    self.converted
                    and self.q_format == QFormat.PyTorchINT8
                )
                y = self.ffn_norm(x, calibrating)
                y = self.ffn(
                    y, deterministic, calibrating,
                    in_qparams=(
                        self.ffn_norm.out_qparams() if cint8 else None
                    ),
                )
                x = self.ffn_res(y, x, calibrating)
        return x


class Transformer(nn.Module):
    """depth x Block (reference vit.py:102-161)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float
    q_format: QFormat
    converted: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x,
        deterministic: bool = True,
        calibrating: bool = False,
        capture_attention: bool = False,
        int8_fused: bool = False,
    ):
        # Blocks that run the UNFUSED composition (stateful observer
        # formats like PyTorchINT8, or MVT_NO_FUSE diagnostics) save
        # fp32 activations at every quant site plus the custom-VJP
        # 3-pass dot residuals — including each layer's (b, h, n, n)
        # fp32 attention probs.  At ViT-S QAT batch 512 that is >30GB,
        # double the chip's HBM.  Rematerialize those blocks: save only
        # the 12 block inputs, recompute activations in the backward
        # (same ops on same inputs: eager grads bit-identical; jitted
        # programs fuse differently and agree to fp32 roundoff —
        # tests/test_vit.py TestUnfusedBlockRemat).  The fused
        # Pallas path keeps its own compact residuals and stays
        # un-remat'd.
        import os as _os
        _FUSED_FMTS = (
            QFormat.FP32, QFormat.FP16_16, QFormat.FP16_32, QFormat.TF32,
        )
        remat = (
            (
                self.q_format not in _FUSED_FMTS
                or _os.environ.get("MVT_NO_FUSE") == "1"
            )
            and not capture_attention
            # the two-pass INT8 QAT fused path keeps its own compact
            # in-kernel residuals (like the stateless fused formats) —
            # block-level remat would only re-run the fused forward
            and not int8_fused
        )
        block_cls = (
            nn.remat(Block, static_argnums=(2, 3, 4, 5))
            if remat else Block
        )
        for i in range(self.depth):
            x = block_cls(
                self.dim,
                self.heads,
                self.dim_head,
                self.mlp_dim,
                self.dropout,
                self.q_format,
                self.converted,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                tp_axis=self.tp_axis,
                model_depth=self.depth,
                name=f"layers_{i}",
            )(x, deterministic, calibrating, capture_attention,
              int8_fused)
        return x


class ClassificationDecoder(nn.Module):
    """cls token -> LayerNorm -> Linear(num_classes) (reference vit.py:325-342)."""

    dim: int
    num_classes: int
    q_format: QFormat
    converted: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, calibrating: bool = False):
        x = x[:, 0]
        norm = QLayerNorm(
            self.dim, self.q_format, self.converted, dtype=self.dtype,
            name="norm",
        )
        x = norm(x, calibrating)
        cint8 = self.converted and self.q_format == QFormat.PyTorchINT8
        return QDense(
            self.num_classes, self.dim, self.q_format, self.converted,
            dtype=self.dtype, name="linear",
        )(x, calibrating,
          in_qparams=norm.out_qparams() if cint8 else None)


class SegmentationDecoder(nn.Module):
    """Drop cls token -> LayerNorm -> per-patch Linear(num_classes) ->
    bilinear upsample to image size ("Segmenter" linear decoder, reference
    vit.py:344-374).  Output is NHWC (B, H, W, num_classes) — the TPU-native
    layout; the reference returns NCHW."""

    dim: int
    num_classes: int
    image_size: int
    patch_size: int
    q_format: QFormat
    converted: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, calibrating: bool = False):
        x = x[:, 1:]
        norm = QLayerNorm(
            self.dim, self.q_format, self.converted, dtype=self.dtype,
            name="norm",
        )
        x = norm(x, calibrating)
        cint8 = self.converted and self.q_format == QFormat.PyTorchINT8
        x = QDense(
            self.num_classes, self.dim, self.q_format, self.converted,
            dtype=self.dtype, name="linear",
        )(x, calibrating,
          in_qparams=norm.out_qparams() if cint8 else None)
        b, hw, c = x.shape
        grid = self.image_size // self.patch_size
        x = x.reshape(b, grid, grid, c).astype(jnp.float32)
        # torch nn.Upsample(mode='bilinear', align_corners=False), as two
        # constant weight matmuls (ops/interpolate.py)
        return resize_bilinear(x, self.image_size, self.image_size)


class DetectionDecoder(nn.Module):
    """YOLOS head on the last num_det_tokens tokens: Linear class logits
    (+1 no-object class) and sigmoid'd Linear box regression
    (reference vit.py:376-396)."""

    dim: int
    num_classes: int
    num_det_tokens: int
    q_format: QFormat
    converted: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, calibrating: bool = False):
        x = x[:, -self.num_det_tokens :, :]
        logits = QDense(
            self.num_classes + 1,
            self.dim,
            self.q_format,
            self.converted,
            dtype=self.dtype,
            name="class_embed",
        )(x, calibrating)
        boxes = QDense(
            4, self.dim, self.q_format, self.converted, dtype=self.dtype,
            name="bbox_embed",
        )(x, calibrating)
        return {
            "pred_logits": logits.astype(jnp.float32),
            "pred_boxes": jax.nn.sigmoid(boxes.astype(jnp.float32)),
        }


def interpolate_pos_embedding(pos_embedding, grid_h, grid_w):
    """Bicubically rescale the stored 14x14 positional grid to
    (grid_h, grid_w) on the fly, YOLOS-style (reference vit.py:292-302).

    Uses a torch-exact separable bicubic (A=-0.75, half-pixel centers)
    expressed as two constant weight matmuls — see ops/interpolate.py;
    ``jax.image.resize`` would use the A=-0.5 kernel and break parity with
    torch/timm checkpoints."""
    _, n, dim = pos_embedding.shape
    src = int(round((n) ** 0.5))
    if (grid_h, grid_w) == (src, src):
        return pos_embedding
    grid = pos_embedding.reshape(1, src, src, dim).astype(jnp.float32)
    grid = resize_bicubic(grid, grid_h, grid_w)
    return grid.reshape(1, grid_h * grid_w, dim).astype(pos_embedding.dtype)


class ViT(nn.Module):
    """The shared backbone + decoder (reference vit.py:164-323).

    Forward contract:
      img: (B, H, W, C) float NHWC.
      Returns logits (classification), NHWC pixel logits (segmentation) or a
      {"pred_logits", "pred_boxes"} dict (detection).

    ``distill_token`` (a (1, 1, dim) array) appends a distillation token to
    the sequence and additionally returns its final embedding — the
    DeiT student path (reference distill.py:35-87; the reference's version
    crashes against the current backbone, see SURVEY §2.2 — this is the
    repaired intent: cls-token pooling + the classification decoder head).
    """

    decoder: str
    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    num_det_tokens: int = 100
    q_format: QFormat = QFormat.FP32
    converted: bool = False
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # head-sharded tensor parallelism: the mesh axis name the fused
    # block kernels shard over (apply() must then run under shard_map
    # with this axis in scope — training/trainer.py tp_fused branch)
    tp_axis: Optional[str] = None

    def setup(self):
        assert self.image_size % self.patch_size == 0, (
            "Image dimensions must be divisible by the patch size."
        )
        num_patches = (self.image_size // self.patch_size) ** 2
        assert num_patches > MIN_NUM_PATCHES, (
            f"your number of patches ({num_patches}) is way too small for "
            f"attention to be effective (at least 16). Try decreasing your "
            f"patch size"
        )
        assert self.decoder in {
            "classification",
            "segmentation",
            "detection",
        }, "decoder must be either classification, segmentation, or detection"

        # quantized-format simulation requires exact fp32 activations
        compute_dtype = (
            jnp.float32 if self.q_format != QFormat.FP32 else self.dtype
        )
        self._dtype = compute_dtype

        patch_dim = self.channels * self.patch_size ** 2
        normal = nn.initializers.normal(stddev=1.0)
        # stored at the fixed 14x14+1 grid regardless of image size
        # (reference vit.py:216-218)
        self.pos_embedding = self.param(
            "pos_embedding", normal, (1, 14 * 14 + 1, self.dim), jnp.float32
        )
        self.pos_embedding_det = self.param(
            "pos_embedding_det",
            normal,
            (1, self.num_det_tokens, self.dim),
            jnp.float32,
        )
        self.cls_token = self.param(
            "cls_token", normal, (1, 1, self.dim), jnp.float32
        )
        self.det_tokens = self.param(
            "det_tokens", normal, (1, self.num_det_tokens, self.dim),
            jnp.float32,
        )
        self.patch_to_embedding = QDense(
            self.dim,
            patch_dim,
            self.q_format,
            self.converted,
            dtype=compute_dtype,
            name="patch_to_embedding",
        )
        self.transformer = Transformer(
            self.dim,
            self.depth,
            self.heads,
            self.dim_head,
            self.mlp_dim,
            self.dropout,
            self.q_format,
            self.converted,
            dtype=compute_dtype,
            attn_impl=self.attn_impl,
            tp_axis=self.tp_axis,
            name="transformer",
        )
        if self.decoder == "classification":
            self.head = ClassificationDecoder(
                self.dim, self.num_classes, self.q_format, self.converted,
                dtype=compute_dtype, name="decoder",
            )
        elif self.decoder == "segmentation":
            self.head = SegmentationDecoder(
                self.dim,
                self.num_classes,
                self.image_size,
                self.patch_size,
                self.q_format,
                self.converted,
                dtype=compute_dtype,
                name="decoder",
            )
        else:
            self.head = DetectionDecoder(
                self.dim,
                self.num_classes,
                self.num_det_tokens,
                self.q_format,
                self.converted,
                dtype=compute_dtype,
                name="decoder",
            )
        self.quant_img = ActQuant(self.q_format, "stub", name="quant_img")
        self.quant_pos_embedding = ActQuant(
            self.q_format, "stub", name="quant_pos_embedding"
        )
        self.quant_cls_token = ActQuant(
            self.q_format, "stub", name="quant_cls_token"
        )
        self.quant_det_tokens = ActQuant(
            self.q_format, "stub", name="quant_det_tokens"
        )
        self.quant_distill_token = ActQuant(
            self.q_format, "stub", name="quant_distill_token"
        )
        self.cls_token_cat = ActQuant(
            self.q_format, "functional", name="cls_token_cat"
        )
        self.pos_embedding_cat = ActQuant(
            self.q_format, "functional", name="pos_embedding_cat"
        )
        self.pos_embedding_add = ActQuant(
            self.q_format, "functional", name="pos_embedding_add"
        )
        self.distill_token_cat = ActQuant(
            self.q_format, "functional", name="distill_token_cat"
        )
        self.emb_drop = nn.Dropout(self.emb_dropout)

    def patchify(self, img):
        """NHWC image -> (B, num_patches, p*p*C) with (row, col, channel)
        per-patch element order (reference vit.py:271-275 does the same from
        NCHW via permute(0,2,4,3,5,1))."""
        b, h, w, c = img.shape
        p = self.patch_size
        x = img.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, (h // p) * (w // p), p * p * c)

    def __call__(
        self,
        img,
        deterministic: bool = True,
        calibrating: bool = False,
        capture_attention: bool = False,
        distill_token=None,
        int8_fused: bool = False,
    ):
        b, h, w, c = img.shape
        p = self.patch_size
        grid_h, grid_w = h // p, w // p
        dtype = self._dtype

        x = self.patchify(img.astype(dtype))
        x = self.quant_img(x, calibrating)
        cint8 = self.converted and self.q_format == QFormat.PyTorchINT8
        with jax.named_scope("patch_to_embedding"):
            x = self.patch_to_embedding(
                x, calibrating,
                in_qparams=(
                    self.quant_img.int8_qparams() if cint8 else None
                ),
            )

        is_detection = self.decoder == "detection"

        cls_tokens = jnp.broadcast_to(
            self.cls_token.astype(dtype), (b, 1, self.dim)
        )
        cls_tokens = self.quant_cls_token(cls_tokens, calibrating)
        if is_detection:
            det_tokens = jnp.broadcast_to(
                self.det_tokens.astype(dtype),
                (b, self.num_det_tokens, self.dim),
            )
            det_tokens = self.quant_det_tokens(det_tokens, calibrating)
            x = self.cls_token_cat(
                jnp.concatenate([cls_tokens, x, det_tokens], axis=1),
                calibrating,
            )
        else:
            x = self.cls_token_cat(
                jnp.concatenate([cls_tokens, x], axis=1), calibrating
            )

        pos_cls = self.pos_embedding[:, 0:1, :]
        pos_patches = interpolate_pos_embedding(
            self.pos_embedding[:, 1:, :], grid_h, grid_w
        )
        if is_detection:
            pos = jnp.concatenate(
                [pos_cls, pos_patches, self.pos_embedding_det], axis=1
            )
        else:
            pos = jnp.concatenate([pos_cls, pos_patches], axis=1)
        pos = self.pos_embedding_cat(pos.astype(dtype), calibrating)
        pos = self.quant_pos_embedding(pos, calibrating)
        x = self.pos_embedding_add(x + pos, calibrating)

        if distill_token is not None:
            # DeiT student: distillation token appended at the end
            # (reference distill.py:65-69)
            dt = jnp.broadcast_to(
                distill_token.astype(dtype), (b, 1, self.dim)
            )
            dt = self.quant_distill_token(dt, calibrating)
            x = self.distill_token_cat(
                jnp.concatenate([x, dt], axis=1), calibrating
            )

        x = self.emb_drop(x, deterministic=deterministic)

        # Sequence padding to a 128 multiple was evaluated and rejected:
        # the Pallas kernels already lane-pad internally where needed, the
        # fused block path requires unpadded sequences (and is faster than
        # anything the padding could buy back), and explicit pads add real
        # sublane work on the (H, N, N) score tensors that implicit lane
        # padding does not.
        with jax.named_scope("transformer"):
            x = self.transformer(
                x, deterministic, calibrating, capture_attention,
                int8_fused,
            )

        if distill_token is not None:
            x, distill_out = x[:, :-1], x[:, -1]

        with jax.named_scope("mlp_head"):
            output = self.head(x, calibrating)

        if isinstance(output, dict):
            pass  # detection dict already fp32
        else:
            output = output.astype(jnp.float32)

        if distill_token is not None:
            return output, distill_out.astype(jnp.float32)
        return output


def vit_kwargs_from_config(config, data_config):
    """Build ViT constructor kwargs from the reference JSON config schema
    (reference utils/models.py:25-60)."""
    vit_config = config["vit_config"]
    kwargs = dict(
        decoder=vit_config["decoder"],
        image_size=vit_config["image_size"],
        patch_size=vit_config["patch_size"],
        num_classes=data_config["number_of_classes"],
        dim=vit_config["embed_dim"],
        depth=vit_config["depth"],
        heads=vit_config["heads"],
        mlp_dim=vit_config["mlp_dim"],
        dropout=vit_config["dropout"],
        emb_dropout=vit_config["emb_dropout"],
        q_format=QFormat[vit_config["q_format"]],
        # every reference config satisfies embed_dim == heads * 64; deriving
        # keeps arbitrary dims (e.g. tiny test models) valid too
        dim_head=vit_config.get(
            "dim_head", vit_config["embed_dim"] // vit_config["heads"]
        ),
    )
    if "num_det_tokens" in vit_config:
        kwargs["num_det_tokens"] = vit_config["num_det_tokens"]
    if "compute_dtype" in vit_config:
        kwargs["dtype"] = jnp.dtype(vit_config["compute_dtype"])
    return kwargs
