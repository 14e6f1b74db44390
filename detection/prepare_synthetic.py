#!/usr/bin/env python
"""Deterministic synthetic DETECTION substrate in the DIOR->COCO layout.

No network egress exists in this environment, so the real DIOR archives
(reference detection/prepare_dior.py downloads VOC-style zips) cannot be
fetched.  This writes a procedurally generated detection dataset in the
exact on-disk layout prepare_dior.py produces (reference
detection/prepare_dior.py:150-213: <root>/{train,val,test}/<id>.jpg +
<root>/annotations/{train,val,test}.json COCO files), so both our stack
and the reference control stack (tools/refcontrol/run_reference.py
--repair-detection) can train and evaluate mAP on identical files.

Task design: 3 object classes distinguishable by shape AND color
(class 0 "block": warm filled rectangle; class 1 "disc": green filled
circle; class 2 "cross": blue plus-shape) over a procedural texture
background with per-image noise.  Box coordinates are exact by
construction.  Images are 160x160 (10x10 = 100 patches at patch 16);
1-4 objects per image, sizes 24-64 px, non-degenerate, may overlap.

Usage:
    python prepare_synthetic.py [--root data/dior_synth_ctl]
"""
import argparse
import json
import os

import numpy as np
from PIL import Image

IMG = 160
CLASSES = [
    {"id": 0, "name": "block", "supercategory": "synthetic"},
    {"id": 1, "name": "disc", "supercategory": "synthetic"},
    {"id": 2, "name": "cross", "supercategory": "synthetic"},
]
SPLITS = [("train", 600, 0), ("val", 96, 100000), ("test", 96, 200000)]


def _background(rng):
    """Procedural texture: low-frequency sin field + broadband noise."""
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    fx, fy = rng.uniform(0.02, 0.09, 2)
    ph = rng.uniform(0, 6.28, 3)
    base = np.stack(
        [
            90 + 50 * np.sin(fx * xx + ph[0]) * np.sin(fy * yy + ph[1]),
            90 + 50 * np.sin(fy * xx + ph[1]) * np.cos(fx * yy + ph[2]),
            90 + 50 * np.cos(fx * xx + ph[2]) * np.sin(fy * yy + ph[0]),
        ],
        axis=-1,
    )
    noise = rng.normal(0, 18, (IMG, IMG, 3))
    return base + noise


def _draw(arr, cat, x, y, w, h, rng):
    """Paint one object; returns nothing (draws in place)."""
    jitter = rng.normal(0, 12, 3)
    if cat == 0:  # warm block
        color = np.array([205, 90, 60]) + jitter
        arr[y:y + h, x:x + w] = color
    elif cat == 1:  # green disc
        color = np.array([70, 190, 85]) + jitter
        cy, cx = y + h / 2.0, x + w / 2.0
        yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
        mask = (
            ((xx - cx) / (w / 2.0)) ** 2 + ((yy - cy) / (h / 2.0)) ** 2
        ) <= 1.0
        arr[mask] = color
    else:  # blue cross
        color = np.array([75, 105, 215]) + jitter
        t_w = max(w // 3, 4)
        t_h = max(h // 3, 4)
        arr[y + (h - t_h) // 2:y + (h + t_h) // 2, x:x + w] = color
        arr[y:y + h, x + (w - t_w) // 2:x + (w + t_w) // 2] = color


def make_split(root, split, n, id_base, rng, easy=False):
    os.makedirs(os.path.join(root, split), exist_ok=True)
    images, annotations = [], []
    ann_id = id_base
    for i in range(n):
        img_id = id_base + i
        arr = _background(rng)
        if easy:
            arr = 0.35 * arr + 0.65 * 120.0  # flatten texture contrast
        n_obj = 1 if easy else rng.randint(1, 5)
        for _ in range(n_obj):
            if easy:
                # single large unambiguous object: the from-scratch
                # control must LEARN (target AP >= 0.2), not just match
                # seed noise (VERDICT r3 weak item 5)
                w, h = rng.randint(64, 113, 2)
            else:
                w, h = rng.randint(24, 65, 2)
            x = rng.randint(0, IMG - w)
            y = rng.randint(0, IMG - h)
            cat = rng.randint(0, len(CLASSES))
            _draw(arr, cat, x, y, w, h, rng)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": int(cat),
                    "bbox": [int(x), int(y), int(w), int(h)],
                    "area": int(w * h),
                    "iscrowd": 0,
                    "segmentation": [],
                }
            )
            ann_id += 1
        arr = np.clip(arr, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, split, f"{img_id}.jpg"), quality=95
        )
        images.append(
            {
                "id": img_id,
                "width": IMG,
                "height": IMG,
                "file_name": f"{img_id}.jpg",
            }
        )
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    with open(os.path.join(root, "annotations", f"{split}.json"), "w") as f:
        json.dump(
            {
                "info": {"description": "synthetic DIOR-layout control"},
                "licenses": [],
                "images": images,
                "annotations": annotations,
                "categories": CLASSES,
            },
            f,
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data/dior_synth_ctl")
    p.add_argument(
        "--easy", action="store_true",
        help="single large object per image on a flattened background "
        "(the learnable from-scratch control substrate)",
    )
    args = p.parse_args()
    rng = np.random.RandomState(20260817)
    for split, n, id_base in SPLITS:
        make_split(args.root, split, n, id_base, rng, easy=args.easy)
    print(f"wrote {args.root}: " + ", ".join(
        f"{s}={n}" for s, n, _ in SPLITS
    ))


if __name__ == "__main__":
    main()
