"""Exact quantized same-checkpoint parity: PTQ through OUR stack and the
REFERENCE stack (shimmed qtorch), same calibration batches, synthetic10
test split."""
import json, sys
sys.path.insert(0, "/root/repo/tools/refcontrol/shims")
sys.path.insert(0, "/root/reference/src")
import numpy as np, torch
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

FMT = sys.argv[1]
cfg = json.load(open("/tmp/eval_ours.json"))
cfg["vit_config"]["q_format"] = FMT
from myrtle_vision_tpu.utils.config import parse_config
from myrtle_vision_tpu.datasets.resisc45 import Resisc45
from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.quantize import QFormat, convert_params
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import prepare_model_and_load_ckpt

dc = parse_config(cfg["data_config_path"])
def make_loader(files):
    ds = Resisc45(mode="eval", dataset_path=dc["dataset_path"],
        imagepaths=dc[files], label_map_path=dc["label_map"],
        transform_config=dc["transform_ops_val"])
    return DataLoader(ds, batch_size=64, drop_last=True)
val_loader, test_loader = make_loader("valid_files"), make_loader("test_files")

q = QFormat[FMT]
kwargs = vit_kwargs_from_config(cfg, dc)
vit = ViT(**kwargs)
tx = create_optimizer(cfg["train_config"])
state = init_train_state(vit, tx, jax.random.PRNGKey(0), jnp.zeros((1, 80, 80, 3)))
state, _ = prepare_model_and_load_ckpt(cfg["train_config"], state, restore_optimizer=False)

CAL = 6
quant = state.quant
calib = jax.jit(lambda p, qv, x: vit.apply(
    {"params": p, **({"quant": qv} if qv else {})}, x,
    calibrating=True, mutable=["quant"])[1].get("quant", qv))
for i, b in enumerate(val_loader.epoch(0)):
    if i >= CAL: break
    quant = calib(state.params, quant, jnp.asarray(b["image"]))
params_c = convert_params(state.params, q)
vit_c = ViT(**dict(kwargs, converted=True))
variables = {"params": params_c}
if quant: variables["quant"] = quant
apply = jax.jit(lambda x: vit_c.apply(variables, x))

# --- reference side ---
from myrtle_vision.models.vit import ViT as RefViT
from myrtle_vision.utils.quantize import QFormat as RefQF
payload = torch.load("/tmp/ours_export.pth", map_location="cpu", weights_only=False)
rv = RefViT(decoder="classification", image_size=80, patch_size=16,
    num_classes=10, dim=128, depth=5, heads=2, mlp_dim=256)
rv.load_state_dict(payload["model"])
rv.quantizer.prepare_qat(RefQF[FMT])
rv.eval()
with torch.no_grad():
    for i, b in enumerate(val_loader.epoch(0)):
        if i >= CAL: break
        rv(torch.from_numpy(np.ascontiguousarray(
            np.asarray(b["image"]).transpose(0, 3, 1, 2))))
rv.convert()
n = c_ours = c_ref = agree = 0
with torch.no_grad():
    for b in test_loader.epoch(0):
        ours = np.asarray(jnp.argmax(apply(jnp.asarray(b["image"])), -1))
        ref = rv(torch.from_numpy(np.ascontiguousarray(
            np.asarray(b["image"]).transpose(0, 3, 1, 2)))).argmax(-1).numpy()
        labels = np.asarray(b["label"])
        n += len(labels); c_ours += (ours == labels).sum()
        c_ref += (ref == labels).sum(); agree += (ours == ref).sum()
print(f"{FMT}: n={n} ours={c_ours/n:.6f} ref_stack={c_ref/n:.6f} "
      f"delta={abs(int(c_ours)-int(c_ref))/n:.6f} agreement={agree/n:.6f}")
