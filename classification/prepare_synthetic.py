#!/usr/bin/env python
"""Generate a synthetic 10-class texture dataset in the RESISC45 layout.

This environment has no network egress, so the real NWPU-RESISC45 images
cannot be downloaded.  This script deterministically generates a
classification dataset that is *structurally* hard — the 10 classes are
procedural texture families distinguishable only by spatial structure
(checkerboards vs gratings vs dot lattices vs rings ...), never by color
(each image draws two random colors) — and writes it in the exact on-disk
format the reference's prepare script produces
(reference: classification/prepare_resisc45.py): ``<root>/images/<class>/
<file>.jpg``, 70/10/20 ``<split>_imagepaths.txt`` files with paths relative
to the root, and ``label_map.json`` (class -> index, sorted order).

It is the shared measurement substrate for the accuracy-parity control
runs recorded in BASELINE.md: the torch reference stack and this framework
train/evaluate on the *same* generated files and splits.

Every image's randomness derives from (seed, class, index) so the dataset
is byte-reproducible.
"""
import argparse
import json
import os

import numpy as np
from PIL import Image

SIZE = 96  # stored image size; configs crop/resize to 80


def _coords(rng, rotate=True):
    """Pixel coordinate grids, optionally in a randomly rotated frame."""
    y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    if rotate:
        th = rng.uniform(0, np.pi)
        c, s = np.cos(th), np.sin(th)
        xr = c * x - s * y
        yr = s * x + c * y
        return xr, yr
    return x, y


def checker(rng):
    p = rng.uniform(10, 16)
    x, y = _coords(rng)
    return (np.sin(2 * np.pi * x / p) * np.sin(2 * np.pi * y / p)) > 0


def grating(rng):
    p = rng.uniform(8, 16)
    x, _ = _coords(rng)
    return np.sin(2 * np.pi * x / p) > 0


def dots(rng):
    p = rng.uniform(12, 18)
    r = p * rng.uniform(0.22, 0.3)
    x, y = _coords(rng)
    dx = np.mod(x, p) - p / 2
    dy = np.mod(y, p) - p / 2
    return dx * dx + dy * dy < r * r


def rings(rng):
    p = rng.uniform(10, 16)
    cx, cy = rng.uniform(0, SIZE, 2)
    y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    d = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    return np.sin(2 * np.pi * d / p) > 0


def blobs(rng):
    """Threshold of low-pass-filtered noise: large irregular patches."""
    n = rng.randn(SIZE, SIZE)
    f = np.fft.rfft2(n)
    fy = np.fft.fftfreq(SIZE)[:, None]
    fx = np.fft.rfftfreq(SIZE)[None, :]
    f *= np.exp(-((fx * fx + fy * fy) / (2 * 0.03 ** 2)))
    sm = np.fft.irfft2(f, s=(SIZE, SIZE))
    return sm > np.median(sm)


def grid(rng):
    p = rng.uniform(12, 20)
    w = rng.uniform(0.1, 0.18)
    x, y = _coords(rng)
    lx = np.abs(np.mod(x / p, 1.0) - 0.5) > (0.5 - w)
    ly = np.abs(np.mod(y / p, 1.0) - 0.5) > (0.5 - w)
    return lx | ly


def hfnoise(rng):
    """Per-pixel salt noise — the finest structure of any class."""
    return rng.rand(SIZE, SIZE) > 0.5


def rects(rng):
    m = np.zeros((SIZE, SIZE), bool)
    for _ in range(rng.randint(4, 9)):
        w, h = rng.randint(10, 40, 2)
        x0 = rng.randint(0, SIZE - w)
        y0 = rng.randint(0, SIZE - h)
        m[y0:y0 + h, x0:x0 + w] ^= True
    return m


def wedges(rng):
    """Half-plane splits by 1-3 random lines (large straight edges)."""
    y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    m = np.zeros((SIZE, SIZE), bool)
    for _ in range(rng.randint(1, 4)):
        th = rng.uniform(0, np.pi)
        off = rng.uniform(0.25 * SIZE, 0.75 * SIZE)
        m ^= (np.cos(th) * x + np.sin(th) * y) > off
    return m


def voronoi(rng):
    """Two-colored nearest-seed cells (polygonal patches)."""
    k = rng.randint(6, 12)
    pts = rng.uniform(0, SIZE, (k, 2)).astype(np.float32)
    cols = rng.randint(0, 2, k).astype(bool)
    y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    d = (x[None] - pts[:, 0, None, None]) ** 2 + (
        y[None] - pts[:, 1, None, None]
    ) ** 2
    return cols[np.argmin(d, axis=0)]


CLASSES = {
    "blobs": blobs,
    "checker": checker,
    "dots": dots,
    "grating": grating,
    "grid": grid,
    "hfnoise": hfnoise,
    "rects": rects,
    "rings": rings,
    "voronoi": voronoi,
    "wedges": wedges,
}


def render(fn, rng):
    """Binary pattern -> RGB uint8 with random two-color palette + noise."""
    mask = fn(rng).astype(np.float32)
    # two random colors, forced apart so the pattern is visible; hue is
    # random per-image so color never identifies the class
    while True:
        a = rng.uniform(0.05, 0.95, 3).astype(np.float32)
        b = rng.uniform(0.05, 0.95, 3).astype(np.float32)
        if np.abs(a - b).sum() > 0.9:
            break
    img = a[None, None] * (1 - mask[..., None]) + b[None, None] * mask[
        ..., None
    ]
    img += rng.normal(0, rng.uniform(0.03, 0.1), img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/synthetic10")
    ap.add_argument("--per_class", type=int, default=400)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    root = args.out
    images = os.path.join(root, "images")
    names = sorted(CLASSES)
    label_map = {name: i for i, name in enumerate(names)}

    splits = {"train": [], "val": [], "test": []}
    for name in names:
        cdir = os.path.join(images, name)
        os.makedirs(cdir, exist_ok=True)
        paths = []
        for i in range(args.per_class):
            rng = np.random.RandomState(
                (args.seed * 1000003 + label_map[name] * 10007 + i)
                % (2 ** 31)
            )
            arr = render(CLASSES[name], rng)
            fname = f"{name}_{i:04d}.jpg"
            Image.fromarray(arr).save(
                os.path.join(cdir, fname), quality=92
            )
            paths.append(f"images/{name}/{fname}")
        n = len(paths)
        # reference split semantics: deterministic 70/10/20 slicing of the
        # sorted per-class file list (prepare_resisc45.py)
        n_train, n_val = int(0.7 * n), int(0.1 * n)
        splits["train"] += paths[:n_train]
        splits["val"] += paths[n_train:n_train + n_val]
        splits["test"] += paths[n_train + n_val:]

    for split, paths in splits.items():
        with open(
            os.path.join(root, f"{split}_imagepaths.txt"), "w"
        ) as f:
            f.write("\n".join(paths))
    with open(os.path.join(root, "label_map.json"), "w") as f:
        json.dump(label_map, f)
    print(
        f"wrote {sum(len(p) for p in splits.values())} images, "
        f"{len(names)} classes -> {root}"
    )


if __name__ == "__main__":
    main()
