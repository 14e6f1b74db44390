#!/usr/bin/env python
"""Input-pipeline throughput: loader img/s vs thread count (VERDICT r3
missing item 3 / next-round item 7).

Generates a 256px-on-disk JPEG dataset (the RESISC45 on-disk format:
256x256 JPEGs, reference classification/prepare_resisc45.py consumes the
NWPU archive's 256px images), then measures the full decode + augment
path (JPEG decode -> RandomResizedCrop 224 -> flip -> normalize ->
collate) through myrtle_vision_tpu.data.DataLoader at several worker
counts, cache OFF.

Run on an idle host (the TPU tunnel host has ONE core; thread scaling
beyond it measures GIL/IO overlap, not parallel decode):

    python tools/perf/loader_bench.py [--images 512] [--batch 64]
        [--threads 1,2,4,8]

Prints one JSON line per thread count:
    {"threads": N, "images_per_sec": X, "sec_per_epoch": Y}
and a final line with the implied thread count to saturate the measured
ViT-S/16 train throughput.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

TRAIN_IPS = 3642.5  # bench.py ViT-S/16 b512 train img/s (r4 headline)


def make_dataset(root, n_images, size=256):
    from PIL import Image

    rng = np.random.RandomState(0)
    classes = [f"class_{i}" for i in range(4)]
    lines = []
    for ci, cls in enumerate(classes):
        os.makedirs(os.path.join(root, "images", cls), exist_ok=True)
        for j in range(n_images // len(classes)):
            rel = f"images/{cls}/img_{j:04d}.jpg"
            path = os.path.join(root, rel)
            if not os.path.exists(path):
                arr = rng.randint(
                    0, 255, (size, size, 3), dtype=np.uint8
                )
                # low-frequency structure so JPEG size/decode cost is
                # realistic (pure noise JPEGs are pathologically large)
                yy, xx = np.mgrid[0:size, 0:size]
                wave = (
                    127 + 90 * np.sin(xx * 0.05 + ci) * np.cos(yy * 0.03)
                ).astype(np.uint8)
                arr = ((arr.astype(np.int32) + 3 * wave[..., None]) // 4)
                Image.fromarray(arr.astype(np.uint8)).save(
                    path, quality=90
                )
            lines.append(rel)
    with open(os.path.join(root, "train_imagepaths.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "label_map.json"), "w") as f:
        json.dump({c: i for i, c in enumerate(classes)}, f)
    return len(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/loader_bench_256")
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--threads", default="1,2,4,8")
    ap.add_argument("--epochs", type=int, default=2,
                    help="timed epochs (first epoch also warms the "
                    "page cache)")
    args = ap.parse_args()

    os.environ.pop("MVT_DECODE_CACHE", None)  # cache OFF: real decode

    n = make_dataset(args.root, args.images)
    from myrtle_vision_tpu.data.loader import DataLoader
    from myrtle_vision_tpu.datasets.resisc45 import Resisc45

    transform = {
        "RandomResizedCrop": 224,
        "RandomHorizontalFlip": None,
        "Normalize": {"Mean": [0.5, 0.5, 0.5], "Std": [0.5, 0.5, 0.5]},
    }
    ds = Resisc45(
        "train", args.root, "train_imagepaths.txt", "label_map.json",
        transform,
    )

    results = []
    for t in [int(x) for x in args.threads.split(",")]:
        loader = DataLoader(
            ds, batch_size=args.batch, shuffle=True, seed=0,
            drop_last=True, num_workers=t, prefetch_batches=2,
        )
        # warm (page cache + pool spinup)
        for _ in loader.epoch(0):
            pass
        t0 = time.perf_counter()
        count = 0
        for e in range(args.epochs):
            for batch in loader.epoch(e + 1):
                count += batch["image"].shape[0]
        dt = time.perf_counter() - t0
        ips = count / dt
        results.append((t, ips))
        print(json.dumps({
            "threads": t,
            "images_per_sec": round(ips, 1),
            "sec_per_epoch": round(dt / args.epochs, 2),
        }), flush=True)

    best = max(r[1] for r in results)
    per_thread = results[0][1]
    print(json.dumps({
        "dataset_images": n,
        "decode_augment_px": "256->224",
        "best_images_per_sec": round(best, 1),
        "single_thread_images_per_sec": round(per_thread, 1),
        "train_target_images_per_sec": TRAIN_IPS,
        "implied_cores_to_saturate": round(TRAIN_IPS / per_thread, 1),
    }))


if __name__ == "__main__":
    main()
