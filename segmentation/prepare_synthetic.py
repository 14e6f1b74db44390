#!/usr/bin/env python
"""Generate a synthetic 5-class texture SEGMENTATION dataset (DLRSD layout).

This environment has no network egress, so the real DLRSD archive cannot
be downloaded.  This script deterministically generates a segmentation
dataset that is structurally hard — each image is partitioned into
Voronoi cells and every cell is painted with one of 5 procedural texture
families (checker / dots / grating / noise / smooth), all drawn from the
SAME per-image two-color palette so color never identifies the class —
and writes it in the exact on-disk format the reference's DLRSD loader
consumes (reference: src/myrtle_vision/datasets/dlrsd.py +
utils/utils.py:load_imagepaths_and_segmaps): image/mask pairs listed as
``<img>,<map>`` lines in ``<split>_imagepaths.txt``, masks stored as
1-BASED uint8 PNGs (the loader subtracts 1), and ``label_map.json``.

It is the shared measurement substrate for the segmentation
accuracy-parity control runs recorded in BASELINE.md: the torch
reference stack and this framework train/evaluate on the *same*
generated files and splits.

Cell sizes are large relative to the 16px patch so a patch-resolution
decoder (reference vit.py:355-371 upsamples patch logits bilinearly) can
in principle segment them; texture periods are small enough to be
recognizable inside one patch.

Every image's randomness derives from (seed, index) so the dataset is
byte-reproducible.
"""
import argparse
import json
import os

import numpy as np
from PIL import Image

# Stored size equals the micro-config eval size so the val-path
# ResizeBoth is an identity in BOTH stacks (mask resample semantics
# never enter the parity surface; train still exercises
# RandomResizedCropBoth).
SIZE = 80


def _tex_checker(rng, x, y):
    p = rng.uniform(6, 10)
    return (np.sin(2 * np.pi * x / p) * np.sin(2 * np.pi * y / p)) > 0


def _tex_dots(rng, x, y):
    p = rng.uniform(8, 12)
    r = p * rng.uniform(0.25, 0.33)
    dx = np.mod(x, p) - p / 2
    dy = np.mod(y, p) - p / 2
    return dx * dx + dy * dy < r * r


def _tex_grating(rng, x, y):
    p = rng.uniform(5, 9)
    th = rng.uniform(0, np.pi)
    return np.sin(2 * np.pi * (np.cos(th) * x + np.sin(th) * y) / p) > 0


def _tex_noise(rng, x, y):
    return rng.rand(*x.shape) > 0.5


def _tex_smooth(rng, x, y):
    return np.zeros(x.shape, bool)


# sorted name -> (index, texture); label_map uses the sorted order like
# the classification substrate
TEXTURES = {
    "checker": _tex_checker,
    "dots": _tex_dots,
    "grating": _tex_grating,
    "noise": _tex_noise,
    "smooth": _tex_smooth,
}


def render(rng):
    """One (image, 0-based mask) pair: Voronoi cells x 5 textures."""
    names = sorted(TEXTURES)
    y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)

    # Voronoi partition: few large cells (>= ~patch scale regions)
    k = rng.randint(4, 8)
    pts = rng.uniform(0, SIZE, (k, 2)).astype(np.float32)
    d = (x[None] - pts[:, 0, None, None]) ** 2 + (
        y[None] - pts[:, 1, None, None]
    ) ** 2
    cell = np.argmin(d, axis=0)

    # each cell gets a class; force at least 2 distinct classes per image
    while True:
        cell_cls = rng.randint(0, len(names), k)
        if len(np.unique(cell_cls)) >= 2:
            break

    mask = cell_cls[cell]  # 0-based class per pixel

    # one two-color palette per image (color never identifies a class)
    while True:
        a = rng.uniform(0.05, 0.95, 3).astype(np.float32)
        b = rng.uniform(0.05, 0.95, 3).astype(np.float32)
        if np.abs(a - b).sum() > 0.9:
            break

    pattern = np.zeros((SIZE, SIZE), bool)
    for ci, name in enumerate(names):
        m = mask == ci
        if not m.any():
            continue
        pattern[m] = TEXTURES[name](rng, x, y)[m]

    img = a[None, None] * (~pattern[..., None]) + b[None, None] * (
        pattern[..., None]
    )
    img += rng.normal(0, rng.uniform(0.03, 0.08), img.shape)
    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return img, mask.astype(np.uint8)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/seg_synth5")
    ap.add_argument("--count", type=int, default=1600)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    root = args.out
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    os.makedirs(os.path.join(root, "maps"), exist_ok=True)
    names = sorted(TEXTURES)
    label_map = {name: i for i, name in enumerate(names)}

    lines = []
    for i in range(args.count):
        rng = np.random.RandomState(
            (args.seed * 1000003 + i * 10007) % (2 ** 31)
        )
        img, mask = render(rng)
        ip = f"imgs/img_{i:05d}.png"
        mp = f"maps/img_{i:05d}.png"
        Image.fromarray(img).save(os.path.join(root, ip))
        # stored masks are 1-based like DLRSD (loader subtracts 1)
        Image.fromarray(mask + 1, mode="L").save(os.path.join(root, mp))
        lines.append(f"{ip},{mp}")

    n = len(lines)
    n_train, n_val = int(0.7 * n), int(0.1 * n)
    splits = {
        "train": lines[:n_train],
        "val": lines[n_train:n_train + n_val],
        "test": lines[n_train + n_val:],
    }
    for split, ls in splits.items():
        with open(os.path.join(root, f"{split}_imagepaths.txt"), "w") as f:
            f.write("\n".join(ls))
    with open(os.path.join(root, "label_map.json"), "w") as f:
        json.dump(label_map, f)
    print(
        f"wrote {n} image/mask pairs, {len(names)} classes -> {root}"
    )


if __name__ == "__main__":
    main()
