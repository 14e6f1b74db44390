"""Exact same-checkpoint eval parity on the synthetic10 test split."""
import json, sys
sys.path.insert(0, "/root/repo/tools/refcontrol/shims")
sys.path.insert(0, "/root/reference/src")
import numpy as np, torch
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import os
cfg = json.load(open(os.environ.get("PARITY_CFG", "/tmp/eval_ours.json")))
from myrtle_vision_tpu.utils.config import parse_config
from myrtle_vision_tpu.datasets.resisc45 import Resisc45
from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import prepare_model_and_load_ckpt

data_config = parse_config(cfg["data_config_path"])
testset = Resisc45(mode="eval", dataset_path=data_config["dataset_path"],
    imagepaths=data_config["test_files"], label_map_path=data_config["label_map"],
    transform_config=data_config["transform_ops_val"])
loader = DataLoader(testset, batch_size=64, drop_last=cfg["train_config"]["drop_last_batch"])

kwargs = vit_kwargs_from_config(cfg, data_config)
kwargs["dtype"] = jnp.float32  # eval-time numerics
vit = ViT(**kwargs)
tx = create_optimizer(cfg["train_config"])
state = init_train_state(
    vit, tx, jax.random.PRNGKey(0),
    jnp.zeros((1, vit.image_size, vit.image_size, 3)))
state, _ = prepare_model_and_load_ckpt(cfg["train_config"], state, restore_optimizer=False)

from myrtle_vision.models.vit import ViT as RefViT
payload = torch.load(os.environ.get("PARITY_PTH", "/tmp/ours_export.pth"), map_location="cpu", weights_only=True)
_vc = cfg["vit_config"]
rv = RefViT(decoder="classification", image_size=_vc["image_size"],
    patch_size=_vc["patch_size"], num_classes=data_config["number_of_classes"],
    dim=_vc["embed_dim"], depth=_vc["depth"], heads=_vc["heads"],
    mlp_dim=_vc["mlp_dim"])
missing, unexpected = rv.load_state_dict(payload["model"], strict=False)
assert not unexpected and not missing, (missing, unexpected)
rv.eval()

apply = jax.jit(lambda p, x: vit.apply({"params": p}, x))
n = c_ours = c_ref = agree = 0
for batch in loader.epoch(0):
    imgs = jnp.asarray(batch["image"])
    ours = np.asarray(jnp.argmax(apply(state.params, imgs), -1))
    timg = torch.from_numpy(np.ascontiguousarray(
        np.asarray(batch["image"]).transpose(0, 3, 1, 2)))
    with torch.no_grad():
        ref = rv(timg).argmax(-1).numpy()
    labels = np.asarray(batch["label"])
    n += len(labels)
    c_ours += (ours == labels).sum()
    c_ref += (ref == labels).sum()
    agree += (ours == ref).sum()
print(f"n={n} ours={c_ours/n:.6f} ref_stack={c_ref/n:.6f} "
      f"delta={abs(c_ours-c_ref)/n:.6f} pred_agreement={agree/n:.6f}")
