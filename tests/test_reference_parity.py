"""Numerical parity against the REFERENCE'S OWN CODE.

These tests import the actual reference implementation from
/root/reference/src (read-only) and execute it in torch on CPU, side by
side with our flax model carrying the *same weights* (moved across with
utils/export.py, the FPGA-handoff state-dict format).  This is the
parity gate VERDICT round 1 asked for: the golden values in
test_timm_parity.py came from a replica the builder wrote; here the
oracle is the reference itself (reference src/myrtle_vision/models/
vit.py:164-396, distill.py:90-151).

qtorch is not installed in this image; the reference's
``utils/quantize.py`` imports it at module scope (quantize.py:4-6), so
the control harness's FUNCTIONAL qtorch shim is installed first
(tools/refcontrol/shims/qtorch, asserted bit-exact with our fake-quant
primitives below).

Reference latent bugs found while building these tests (verified
empirically, pinned below so the divergence is documented):

1. ``ViT.__init__`` first sets ``self.decoder`` to the decoder *name*
   (vit.py:196) and then overwrites it with the decoder *module*
   (vit.py:235-252).  The forward's ``self.decoder == "detection"``
   checks (vit.py:287,299) therefore always compare a module to a str
   and are always False: the reference NEVER appends its det_tokens nor
   pos_embedding_det — its DetectionDecoder consumes the last
   ``num_det_tokens`` *patch* tokens.  Our model implements the YOLOS
   intent (tokens appended).  For logits parity we repair the reference
   in-test with an ``__eq__`` patch and separately pin the unpatched
   behavior.

2. ``DistillableViT.forward`` references ``self.pool``,
   ``self.to_latent`` and ``self.mlp_head`` (distill.py:76-80) which do
   not exist on the current ViT — the documented SURVEY §2.2 defect.
   We repair the instance with the intended members (cls pooling,
   identity latent, the classification head) and then require our loss
   to match the repaired reference exactly.

3. The reference's PyTorchINT8 CONVERTED model crashes on its own ViT:
   ``pos_embedding_cat`` concatenates raw (never-quantized) parameter
   slices (vit.py:292-302), so the converted QFunctional.cat gets fp32
   inputs and quantized::cat raises.  Pinned below.
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from myrtle_vision_tpu.models.distill import DistillWrapper  # noqa: E402
from myrtle_vision_tpu.models.vit import ViT  # noqa: E402
from myrtle_vision_tpu.utils.export import (  # noqa: E402
    export_torch_state_dict,
)

REF_SRC = "/root/reference/src"


def _install_qtorch_stub():
    """Install the control harness's FUNCTIONAL qtorch shim
    (tools/refcontrol/shims/qtorch — its numerics are asserted bit-exact
    with our fake-quant primitives below).  The FP32 parity tests don't
    exercise it (non-identity quantizers there would break the 1e-4
    logits parity); the TF32 forward test does."""
    if "qtorch" in sys.modules:
        return
    shims = "/root/repo/tools/refcontrol/shims"
    if shims not in sys.path:
        sys.path.insert(0, shims)
    import qtorch  # noqa: F401  (the shim package)


@pytest.fixture(scope="module")
def ref():
    _install_qtorch_stub()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    vit_mod = pytest.importorskip("myrtle_vision.models.vit")
    distill_mod = pytest.importorskip("myrtle_vision.models.distill")
    return types.SimpleNamespace(vit=vit_mod, distill=distill_mod)


COMMON = dict(
    image_size=80, patch_size=16, num_classes=5, dim=64, depth=2, heads=2,
    mlp_dim=128, dim_head=32, num_det_tokens=7,
)


def build_ours(decoder, **over):
    kw = {**COMMON, **over}
    model = ViT(decoder=decoder, dtype=jnp.float32, **kw)
    img = jnp.zeros((1, kw["image_size"], kw["image_size"], 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(7), img)
    return model, variables


def build_ref(ref, decoder, params, **over):
    kw = {**COMMON, **over}
    torch.manual_seed(0)
    rv = ref.vit.ViT(decoder=decoder, **kw)
    sd = {
        k: torch.from_numpy(v)
        for k, v in export_torch_state_dict(params, decoder).items()
    }
    missing, unexpected = rv.load_state_dict(sd, strict=False)
    assert not unexpected, f"export produced unknown keys: {unexpected}"
    assert not missing, f"reference params not covered by export: {missing}"
    rv.eval()
    return rv


def run_pair(ref, decoder, image_size, seed=3, repair_detection=False):
    ours, variables = build_ours(decoder, image_size=image_size)
    rv = build_ref(ref, decoder, variables["params"], image_size=image_size)
    rng = np.random.RandomState(seed)
    img = rng.randn(2, image_size, image_size, 3).astype(np.float32)
    out_j = ours.apply(variables, jnp.asarray(img))

    timg = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
    ctx = _detection_repair(ref) if repair_detection else _nullctx()
    with ctx, torch.no_grad():
        out_t = rv(timg)
    return out_j, out_t


class _nullctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _detection_repair:
    """Make the reference's ``self.decoder == "detection"`` checks
    (vit.py:287,299) see the intended True by giving DetectionDecoder a
    string-aware __eq__ for the duration of the test."""

    def __init__(self, ref):
        self.cls = ref.vit.DetectionDecoder

    def __enter__(self):
        self.cls.__eq__ = lambda self, other: other == "detection"
        self.cls.__hash__ = object.__hash__
        return self

    def __exit__(self, *a):
        del self.cls.__eq__
        del self.cls.__hash__
        return False


# ---------------------------------------------------------------------------
# Backbone + decoder logits, all three decoders, reference as oracle
# ---------------------------------------------------------------------------


def test_classification_logits_match_reference(ref):
    out_j, out_t = run_pair(ref, "classification", 80)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-4
    )


def test_classification_logits_match_reference_interp_96(ref):
    """96px image: exercises the on-the-fly bicubic pos-embed interpolation
    (14x14 -> 6x6) against torch F.interpolate (reference vit.py:292-302)."""
    out_j, out_t = run_pair(ref, "classification", 96)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-4
    )


def test_segmentation_logits_match_reference(ref):
    out_j, out_t = run_pair(ref, "segmentation", 80)
    # ours is NHWC (TPU-native), reference NCHW (vit.py:366-369)
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2),
        out_t.numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_detection_logits_match_repaired_reference(ref):
    out_j, out_t = run_pair(ref, "detection", 80, repair_detection=True)
    np.testing.assert_allclose(
        np.asarray(out_j["pred_logits"]),
        out_t["pred_logits"].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_j["pred_boxes"]),
        out_t["pred_boxes"].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_reference_detection_latent_bug_pinned(ref):
    """Unpatched, the reference silently drops its det tokens (decoder
    attribute clobbered, vit.py:196 vs 235-252): its output equals decoding
    the last N patch tokens of a det-token-free sequence, and differs from
    the YOLOS-intent forward.  Pinned so the documented divergence between
    the reference's actual behavior and ours stays verified."""
    ours, variables = build_ours("detection")
    rv = build_ref(ref, "detection", variables["params"])
    rng = np.random.RandomState(11)
    img = rng.randn(1, 80, 80, 3).astype(np.float32)
    timg = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        buggy = rv(timg)
        with _detection_repair(ref):
            intended = rv(timg)
    # the bug is real: det tokens change the logits
    assert not np.allclose(
        buggy["pred_logits"].numpy(),
        intended["pred_logits"].numpy(),
        atol=1e-5,
    )
    # and our model implements the intended (repaired) semantics
    out_j = ours.apply(variables, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(out_j["pred_logits"]),
        intended["pred_logits"].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


# ---------------------------------------------------------------------------
# DistillWrapper loss vs the (repaired) reference
# ---------------------------------------------------------------------------


def test_distill_wrapper_loss_matches_reference(ref):
    """Loss-value parity with reference DistillWrapper (distill.py:120-151).

    image_size=224 because the reference's student forward skips pos-embed
    interpolation (distill.py:58-63) and only works at the native 14x14
    grid.  The student instance is repaired with the intended members
    (SURVEY §2.2); the loss formula under test is the reference's own.
    """
    kw = dict(
        image_size=224, patch_size=16, num_classes=5, dim=32, depth=1,
        heads=2, mlp_dim=64, dim_head=16, num_det_tokens=7,
    )
    student = ViT(decoder="classification", dtype=jnp.float32, **kw)
    wrapper = DistillWrapper(student=student, temperature=2.5, alpha=0.3)
    rng = np.random.RandomState(5)
    img = rng.randn(4, 224, 224, 3).astype(np.float32)
    labels = np.array([0, 3, 1, 4])
    # deterministic "teacher": per-channel spatial means through a fixed
    # linear map — trivially identical on both sides
    w_t = rng.randn(3, kw["num_classes"]).astype(np.float32)
    teacher_logits = img.mean(axis=(1, 2)) @ w_t

    variables = wrapper.init(
        jax.random.PRNGKey(2),
        jnp.asarray(img),
        jnp.asarray(labels),
        jnp.asarray(teacher_logits),
    )
    loss_j, _ = wrapper.apply(
        variables,
        jnp.asarray(img),
        jnp.asarray(labels),
        jnp.asarray(teacher_logits),
    )

    # reference student with the same weights + instance repairs
    p = variables["params"]
    torch.manual_seed(0)
    rstudent = ref.distill.DistillableViT(decoder="classification", **kw)
    sd = {
        k: torch.from_numpy(v)
        for k, v in export_torch_state_dict(
            p["student"], "classification"
        ).items()
    }
    missing, unexpected = rstudent.load_state_dict(sd, strict=False)
    assert not unexpected
    rstudent.pool = "cls"
    rstudent.to_latent = torch.nn.Identity()
    head = torch.nn.Sequential(
        torch.nn.LayerNorm(kw["dim"]), torch.nn.Linear(kw["dim"], 5)
    )
    with torch.no_grad():
        head[0].weight.copy_(sd["decoder.norm.weight"])
        head[0].bias.copy_(sd["decoder.norm.bias"])
        head[1].weight.copy_(sd["decoder.linear.weight"])
        head[1].bias.copy_(sd["decoder.linear.bias"])
    rstudent.mlp_head = head

    class Teacher(torch.nn.Module):
        def forward(self, x):
            return x.mean(dim=(2, 3)) @ torch.from_numpy(w_t)

    rwrap = ref.distill.DistillWrapper(
        teacher=Teacher(), student=rstudent, temperature=2.5, alpha=0.3
    )
    with torch.no_grad():
        def t(x):
            return torch.from_numpy(np.array(x, np.float32, copy=True))

        rwrap.distillation_token.copy_(t(p["distillation_token"]))
        rwrap.distill_mlp[0].weight.copy_(t(p["distill_mlp_norm"]["scale"]))
        rwrap.distill_mlp[0].bias.copy_(t(p["distill_mlp_norm"]["bias"]))
        rwrap.distill_mlp[1].weight.copy_(
            t(np.asarray(p["distill_mlp_linear"]["kernel"]).T)
        )
        rwrap.distill_mlp[1].bias.copy_(t(p["distill_mlp_linear"]["bias"]))
    rwrap.eval()
    timg = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        loss_t = rwrap(timg, torch.from_numpy(labels))

    np.testing.assert_allclose(
        float(loss_j), float(loss_t), rtol=1e-5, atol=1e-6
    )


# ---------------------------------------------------------------------------
# qtorch shim numerics: the control harness's functional qtorch must be
# bit-exact with our fake-quant primitives (that equivalence is what makes
# the reference control runs through tools/refcontrol meaningful)
# ---------------------------------------------------------------------------


def test_qtorch_shim_bit_exact_with_our_primitives():
    import importlib.util

    from myrtle_vision_tpu.ops import fake_quant as fq

    spec = importlib.util.spec_from_file_location(
        "refctl_qtorch",
        "/root/repo/tools/refcontrol/shims/qtorch/__init__.py",
    )
    qtorch_shim = importlib.util.module_from_spec(spec)
    sys.modules["refctl_qtorch"] = qtorch_shim
    spec.loader.exec_module(qtorch_shim)
    quant = qtorch_shim.quant

    rng = np.random.RandomState(0)
    # edge cases: subnormals, halfway points, saturation, zeros, mixed
    x = np.concatenate(
        [
            rng.randn(4096).astype(np.float32) * 10,
            rng.randn(1024).astype(np.float32) * 1e-6,  # fp16 subnormals
            np.float32([0.0, -0.0, 65504.0, 65520.0, 70000.0, -70000.0]),
            np.float32([1 + 2 ** -11, 1 + 2 ** -10, 1 + 3 * 2 ** -11]),
            np.float32([2.5, -2.5, 0.125, 1023.75, -1024.0009765625]),
        ]
    )
    tx = torch.from_numpy(x)

    # fp16 e5m10
    ours = np.asarray(fq.float_quantize(jnp.asarray(x), 5, 10))
    shim = quant.float_quantize(tx, 5, 10).numpy()
    np.testing.assert_array_equal(ours, shim)

    # TF32 e8m10
    ours = np.asarray(fq.float_quantize(jnp.asarray(x), 8, 10))
    shim = quant.float_quantize(tx, 8, 10).numpy()
    np.testing.assert_array_equal(ours, shim)

    # fixed point wl=11, fl in {7, 8, 9}
    for fl in (7, 8, 9):
        ours = np.asarray(fq.fixed_point_quantize(jnp.asarray(x), 11, fl))
        shim = quant.fixed_point_quantize(tx, 11, fl).numpy()
        np.testing.assert_array_equal(ours, shim, err_msg=f"fl={fl}")


def test_reference_tf32_prepare_qat_forward_via_shim(ref):
    """End-to-end guard for the control harness: the reference's TF32
    prepare_qat + forward must run through the shimmed qtorch (a dtype
    promotion bug in the shim once silently DOUBLED the channel dim via
    int64.view(float32) - this pins the fix)."""
    from myrtle_vision.utils.quantize import QFormat as RefQFormat

    torch.manual_seed(0)
    rv = ref.vit.ViT(
        decoder="classification", image_size=80, patch_size=16,
        num_classes=5, dim=32, depth=1, heads=2, mlp_dim=64, dim_head=16,
    )
    rv.quantizer.prepare_qat(RefQFormat["TF32"])
    rv.eval()
    with torch.no_grad():
        out = rv(torch.randn(2, 3, 80, 80))
    assert out.shape == (2, 5)


def test_reference_int8_convert_latent_bug_pinned(ref):
    """Reference latent bug #3: its PyTorchINT8 CONVERTED model crashes on
    its own ViT.  The forward concatenates pos_embedding slices through
    ``pos_embedding_cat`` BEFORE ``quant_pos_embedding`` is applied
    (vit.py:292-302 vs 304-310), so after torch.quantization.convert the
    resulting QFunctional.cat receives never-quantized fp32 tensors and
    raises (quantized::cat has no fp32-CPU kernel).  Pinned so the
    divergence is documented: our PyTorchINT8 convert path works (true
    int8 storage, tests/test_convert.py) where the reference's crashes."""
    from myrtle_vision.utils.quantize import QFormat as RefQFormat

    torch.manual_seed(0)
    rv = ref.vit.ViT(
        decoder="classification", image_size=80, patch_size=16,
        num_classes=5, dim=32, depth=1, heads=2, mlp_dim=64, dim_head=16,
    )
    rv.quantizer.prepare_qat(RefQFormat["PyTorchINT8"])
    rv.eval()
    x = torch.randn(2, 3, 80, 80)
    with torch.no_grad():
        rv(x)  # calibration forward works
    rv.convert()
    with pytest.raises(NotImplementedError, match="quantized::cat"):
        with torch.no_grad():
            rv(x)
