"""Exact same-checkpoint DETECTION eval parity on the synthetic test split.

Runs ONE trained checkpoint through BOTH stacks on the same preprocessed
images: ours (jax model + our from-scratch CocoEvaluator) and the
repaired reference (torch CPU, weights from export_checkpoint.py, its
own PostProcess + CocoEvaluator protocol via the pycocotools shim) —
prints both stacks' AP@[.5:.95], the delta, and raw-output agreement
(max |Δ| over pred_logits / pred_boxes).

The reference's det-token forward is restored with the same repair the
parity tests use (tests/test_reference_parity.py::_detection_repair);
note the reference's get_models ignores vit_config["num_det_tokens"]
(utils/models.py:29-42), so the checkpoint must use the default 100.

Env: PARITY_CFG (our config json, checkpoint_path set),
PARITY_PTH (exported torch .pth).
Reference surface matched: detection/test.py:58-73.
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
from myrtle_vision_tpu.datasets.coco import CocoDetection
from myrtle_vision_tpu.models.vit import ViT, vit_kwargs_from_config
from myrtle_vision_tpu.training.detection import (
    evaluate_coco,
    make_detect_fn,
)
from myrtle_vision_tpu.training.optim import create_optimizer
from myrtle_vision_tpu.training.trainer import init_train_state
from myrtle_vision_tpu.utils.checkpoint import prepare_model_and_load_ckpt
from myrtle_vision_tpu.utils.config import parse_config
from myrtle_vision_tpu.transforms import detection as T

data_config = parse_config(cfg["data_config_path"])
n_classes = data_config["number_of_classes"]
vc = cfg["vit_config"]
num_det_tokens = vc.get("num_det_tokens", 100)
dataset_path = data_config["dataset_path"]
ann_file = os.path.join(
    dataset_path, "annotations", data_config["test_annotations"]
)

testset = CocoDetection(
    os.path.join(dataset_path, data_config["test_images"]),
    ann_file,
    T.from_config(data_config["transform_ops_val"]),
    subset=data_config.get("test_subset"),
)
loader = DataLoader(
    testset,
    batch_size=cfg["train_config"]["local_batch_size"],
    drop_last=False,
    collate_fn=lambda items: T.collate_detection(
        items, max_boxes=num_det_tokens
    ),
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

# ---- repaired reference stack ----
from myrtle_vision.models.vit import DetectionDecoder
from myrtle_vision.models.vit import ViT as RefViT
from myrtle_vision.models.detector import PostProcess
from myrtle_vision.datasets.coco_eval import CocoEvaluator as RefCocoEvaluator
from pycocotools.coco import COCO

DetectionDecoder.__eq__ = lambda self, other: other == "detection"
DetectionDecoder.__hash__ = object.__hash__

payload = torch.load(
    os.environ["PARITY_PTH"], map_location="cpu", weights_only=True
)
if isinstance(payload, dict) and "model" in payload:
    payload = payload["model"]
rv = RefViT(
    decoder="detection", image_size=vc["image_size"],
    patch_size=vc["patch_size"], num_classes=n_classes,
    dim=vc["embed_dim"], depth=vc["depth"], heads=vc["heads"],
    mlp_dim=vc["mlp_dim"], num_det_tokens=num_det_tokens,
)
missing, unexpected = rv.load_state_dict(payload, strict=False)
assert not unexpected and not missing, (missing, unexpected)
rv.eval()

detect = make_detect_fn(vit)
ref_pp = PostProcess()
eval_ref = RefCocoEvaluator(COCO(ann_file), ["bbox"])

# ours: the PRODUCTION eval path itself (training/detection.py), so the
# parity number cannot drift from what training/test.py report
print("--- our stack ---")
eval_ours = evaluate_coco(detect, state, loader, testset.coco)

# reference stack on the SAME batches (the loader is deterministic at
# epoch 0), plus raw-output deltas against our forward
n = 0
dlogits = dboxes = 0.0
for batch in loader.epoch(0):
    imgs = jnp.asarray(batch["image"])
    out = detect(state.params, state.quant, imgs)

    timg = torch.from_numpy(
        np.ascontiguousarray(
            np.asarray(batch["image"]).transpose(0, 3, 1, 2)
        )
    )
    with torch.no_grad():
        rout = rv(timg)
    sizes = torch.from_numpy(np.asarray(batch["orig_size"]))
    rres = ref_pp(rout, sizes)
    eval_ref.update(
        {
            int(img_id): rres[i]
            for i, img_id in enumerate(batch["image_id"])
        }
    )
    dlogits = max(
        dlogits,
        float(
            np.abs(
                np.asarray(out["pred_logits"]) - rout["pred_logits"].numpy()
            ).max()
        ),
    )
    dboxes = max(
        dboxes,
        float(
            np.abs(
                np.asarray(out["pred_boxes"]) - rout["pred_boxes"].numpy()
            ).max()
        ),
    )
    n += len(batch["image_id"])

print("--- reference stack ---")
eval_ref.synchronize_between_processes()
eval_ref.accumulate()
eval_ref.summarize()
ours_ap = float(eval_ours.stats[0])
ref_ap = float(eval_ref.coco_eval["bbox"].stats[0])
print(
    f"n={n} ours_ap={ours_ap:.6f} ref_stack_ap={ref_ap:.6f} "
    f"delta={abs(ours_ap - ref_ap):.6f} "
    f"max|dlogits|={dlogits:.3e} max|dboxes|={dboxes:.3e}"
)
