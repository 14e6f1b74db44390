"""Exact same-checkpoint SEGMENTATION eval parity on the synthetic test split.

Runs ONE trained checkpoint through BOTH stacks on the same test files:
ours (jax, our Dlrsd loader + MIoU) and the reference's own model +
MIoU implementation (torch CPU, weights from export_checkpoint.py) —
prints both stacks' mIoU, the delta, and per-pixel prediction agreement.

Env: PARITY_CFG (our config json), PARITY_PTH (exported torch .pth).
Reference surface matched: segmentation/test.py:79-88, utils/miou.py.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo/tools/refcontrol/shims")
sys.path.insert(0, "/root/reference/src")

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

cfg = json.load(open(os.environ["PARITY_CFG"]))

from myrtle_vision_tpu.data.loader import DataLoader
from myrtle_vision_tpu.datasets.dlrsd import Dlrsd
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import prepare_model_and_load_ckpt
from myrtle_vision_tpu.utils.config import parse_config
from myrtle_vision_tpu.utils.metrics import MIoU

data_config = parse_config(cfg["data_config_path"])
n_classes = data_config["number_of_classes"]
testset = Dlrsd(
    mode="test",
    dataset_path=data_config["dataset_path"],
    imagepaths=data_config["test_files"],
    label_map_path=data_config["label_map"],
    transform_config=data_config["transform_ops_val"],
)
loader = DataLoader(
    testset, batch_size=64, drop_last=cfg["train_config"]["drop_last_batch"],
    pad_last=True,
)

cfg["vit_config"]["dropout"] = 0.0
cfg["vit_config"]["emb_dropout"] = 0.0
kwargs = vit_kwargs_from_config(cfg, data_config)
kwargs["dtype"] = jnp.float32  # eval-time numerics
vit = ViT(**kwargs)
tx = create_optimizer(cfg["train_config"])
state = init_train_state(
    vit, tx, jax.random.PRNGKey(0),
    jnp.zeros((1, vit.image_size, vit.image_size, 3)),
)
state, _ = prepare_model_and_load_ckpt(
    cfg["train_config"], state, restore_optimizer=False
)

from myrtle_vision.models.vit import ViT as RefViT
from myrtle_vision.utils.miou import MIoU as RefMIoU

payload = torch.load(
    os.environ["PARITY_PTH"], map_location="cpu", weights_only=True
)
if isinstance(payload, dict) and "model" in payload:
    payload = payload["model"]
vc = cfg["vit_config"]
rv = RefViT(
    decoder="segmentation", image_size=vc["image_size"],
    patch_size=vc["patch_size"], num_classes=n_classes,
    dim=vc["embed_dim"], depth=vc["depth"], heads=vc["heads"],
    mlp_dim=vc["mlp_dim"],
)
missing, unexpected = rv.load_state_dict(payload, strict=False)
assert not unexpected and not missing, (missing, unexpected)
rv.eval()

apply = jax.jit(lambda p, x: vit.apply({"params": p}, x))
miou_ours = MIoU(num_classes=n_classes)
miou_ref = RefMIoU(n_classes, "cpu")
n = agree = total_px = 0
for batch in loader.epoch(0):
    nv = int(batch.pop("_n_valid", len(batch["label"])))
    imgs = jnp.asarray(batch["image"])
    ours = np.asarray(jnp.argmax(apply(state.params, imgs), -1))[:nv]
    timg = torch.from_numpy(
        np.ascontiguousarray(
            np.asarray(batch["image"])[:nv].transpose(0, 3, 1, 2)
        )
    )
    with torch.no_grad():
        ref = rv(timg).argmax(dim=1).numpy()
    labels = np.asarray(batch["label"])[:nv]
    miou_ours.add_batch(ours, labels)
    miou_ref.add_img(torch.from_numpy(ref), torch.from_numpy(labels))
    n += nv
    agree += (ours == ref).sum()
    total_px += ours.size
print(
    f"n={n} ours_miou={miou_ours.get_miou():.6f} "
    f"ref_stack_miou={float(miou_ref.get_miou()):.6f} "
    f"delta={abs(miou_ours.get_miou() - float(miou_ref.get_miou())):.6f} "
    f"pixel_agreement={agree / total_px:.6f}"
)
