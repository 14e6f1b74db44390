"""True low-precision storage after convert() (reference
quantize.py:329-348 converts to actual torch quantized modules: int8
weight storage + integer kernels; here the converted param tree stores
int8/fp16 arrays and the model dequantizes on use — numerically identical
to the fake-quant simulation, measurably smaller on disk)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from myrtle_vision_tpu.models.vit import ViT
from myrtle_vision_tpu.quantize import QFormat, convert_params, model_size_mb

KW = dict(
    decoder="classification", image_size=80, patch_size=16, num_classes=4,
    dim=64, depth=2, heads=2, mlp_dim=128, dim_head=32,
    dtype=jnp.float32,
)


def _setup(q_format):
    model = ViT(q_format=q_format, **KW)
    img = jnp.asarray(
        np.random.RandomState(0).randn(2, 80, 80, 3), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(1), img)
    return model, variables, img


def _kernels(tree, out):
    for k, v in tree.items():
        if k == "kernel":
            out.append(v)
        elif isinstance(v, dict):
            _kernels(v, out)
    return out


def test_int8_convert_stores_int8_and_matches_simulation():
    model, variables, img = _setup(QFormat.PyTorchINT8)
    # calibrate observers once so activations quantize in both paths
    _, upd = model.apply(
        variables, img, calibrating=True, mutable=["quant"]
    )
    variables = {"params": variables["params"], "quant": upd["quant"]}
    sim = model.apply(variables, img)

    converted = convert_params(variables["params"], QFormat.PyTorchINT8)
    for k in _kernels(converted, []):
        assert np.asarray(k).dtype == np.int8
    model_c = ViT(q_format=QFormat.PyTorchINT8, converted=True, **KW)
    out = model_c.apply(
        {"params": converted, "quant": variables["quant"]}, img
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(sim), rtol=1e-5, atol=1e-6
    )

    # true storage: kernels are 1 byte/weight -> much smaller tree
    full = model_size_mb({"params": variables["params"]}, QFormat.FP32)
    small = model_size_mb(
        {"params": converted}, QFormat.PyTorchINT8, converted=True
    )
    assert small < 0.45 * full  # kernels dominate; 4x on the linear share


def test_fp16_convert_stores_fp16_and_matches_simulation():
    model, variables, img = _setup(QFormat.FP16_32)
    sim = model.apply(variables, img)
    converted = convert_params(variables["params"], QFormat.FP16_32)
    for k in _kernels(converted, []):
        assert np.asarray(k).dtype == np.float16
    model_c = ViT(q_format=QFormat.FP16_32, converted=True, **KW)
    out = model_c.apply({"params": converted}, img)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(sim), rtol=1e-5, atol=1e-6
    )


def test_tf32_convert_keeps_fp32_containers():
    _, variables, _ = _setup(QFormat.TF32)
    converted = convert_params(variables["params"], QFormat.TF32)
    for k in _kernels(converted, []):
        assert np.asarray(k).dtype == np.float32


def test_converted_checkpoint_roundtrip_and_disk_size(tmp_path):
    """int8 storage survives msgpack serialization and the converted file
    is actually smaller on disk than the fp32 one."""
    from flax import serialization

    model, variables, img = _setup(QFormat.PyTorchINT8)
    converted = convert_params(variables["params"], QFormat.PyTorchINT8)

    p_fp32 = os.path.join(tmp_path, "fp32.msgpack")
    p_int8 = os.path.join(tmp_path, "int8.msgpack")
    with open(p_fp32, "wb") as f:
        f.write(
            serialization.msgpack_serialize(
                jax.tree_util.tree_map(np.asarray, variables["params"])
            )
        )
    with open(p_int8, "wb") as f:
        f.write(
            serialization.msgpack_serialize(
                jax.tree_util.tree_map(np.asarray, converted)
            )
        )
    assert os.path.getsize(p_int8) < 0.45 * os.path.getsize(p_fp32)

    with open(p_int8, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    ks = _kernels(restored, [])
    assert all(np.asarray(k).dtype == np.int8 for k in ks)
    model_c = ViT(q_format=QFormat.PyTorchINT8, converted=True, **KW)
    quant = variables["quant"]
    out1 = model_c.apply({"params": converted, "quant": quant}, img)
    out2 = model_c.apply({"params": restored, "quant": quant}, img)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_int8_converted_runs_integer_dots():
    """The converted PyTorchINT8 model must execute its linear layers as
    int8 x int8 -> int32 dots (the MXU integer path), not as dequantized
    fp32 matmuls — inspect the jaxpr for integer dot_generals."""
    model, variables, img = _setup(QFormat.PyTorchINT8)
    _, upd = model.apply(
        variables, img, calibrating=True, mutable=["quant"]
    )
    variables = {"params": variables["params"], "quant": upd["quant"]}
    converted = convert_params(variables["params"], QFormat.PyTorchINT8)
    model_c = ViT(q_format=QFormat.PyTorchINT8, converted=True, **KW)

    jaxpr = jax.make_jaxpr(
        lambda p, q, x: model_c.apply({"params": p, "quant": q}, x)
    )(converted, variables["quant"], img)
    text = str(jaxpr)
    # every QDense (patch embed, per-block qkv/out/fc1/fc2, head) should
    # contribute an s8 dot with s32 accumulation
    assert "preferred_element_type=int32" in text, (
        "no integer dot_general found in the converted model's jaxpr"
    )
    n_int_dots = text.count("preferred_element_type=int32")
    # patch_to_embedding + 2 blocks x 4 linears + head = 10 integer dots
    assert n_int_dots >= 10, f"expected >=10 integer dots, {n_int_dots}"


def test_int8_fused_blocks_match_unfused():
    """The fused converted-INT8 block kernels (ops/fused_int8_block.py)
    vs the discrete-site composition (QDense._int8_forward + ActQuant):
    same observers, same integer dots, same requants.  The only intended
    deviation is the kernels' polynomial-erf GELU (1.5e-7 vs exact erf),
    which can flip isolated gelu_out requant rints by one uint8 step —
    bounded here."""
    model, variables, img = _setup(QFormat.PyTorchINT8)
    _, upd = model.apply(
        variables, img, calibrating=True, mutable=["quant"]
    )
    converted = convert_params(variables["params"], QFormat.PyTorchINT8)
    model_c = ViT(q_format=QFormat.PyTorchINT8, converted=True, **KW)
    vs = {"params": converted, "quant": upd["quant"]}

    prev = os.environ.get("MVT_INT8_FUSE")
    try:
        os.environ["MVT_INT8_FUSE"] = "0"
        out_unfused = model_c.apply(vs, img)
        os.environ.pop("MVT_INT8_FUSE")
        out_fused = model_c.apply(vs, img)
    finally:
        if prev is None:
            os.environ.pop("MVT_INT8_FUSE", None)
        else:
            os.environ["MVT_INT8_FUSE"] = prev
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_unfused),
        rtol=1e-4, atol=1e-4,
    )


def test_int8_fused_no_stats_passthrough():
    """A converted model whose observers never calibrated must not crash
    or NaN through the fused kernels (requants pass through; the integer
    dots use the guard scale)."""
    model, variables, img = _setup(QFormat.PyTorchINT8)
    converted = convert_params(variables["params"], QFormat.PyTorchINT8)
    model_c = ViT(q_format=QFormat.PyTorchINT8, converted=True, **KW)
    out = model_c.apply(
        {"params": converted, "quant": variables["quant"]}, img
    )
    assert np.isfinite(np.asarray(out)).all()
