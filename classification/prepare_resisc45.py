#!/usr/bin/env python
"""Prepare the NWPU-RESISC45 dataset: deterministic 70/10/20 split.

Reference parity (reference: classification/prepare_resisc45.py): for each
class directory under the dataset root, the (sorted) images are sliced into
train/val/test by fixed fractions, written as ``<split>_imagepaths.txt``
(paths relative to the dataset root, ``<class>/<image>`` — the loader
derives the text label from the directory component), plus a
``label_map.json`` mapping class name -> index in sorted order.
"""
import argparse
import json
import os


def prepare(dataset_path, train_frac=0.7, val_frac=0.1):
    images_dir = os.path.join(dataset_path, "images")
    if not os.path.isdir(images_dir):
        # first run: move the per-class directories under images/
        # (the loader derives the text label from path component 1,
        # i.e. paths are "images/<class>/<file>" — reference layout)
        classes = sorted(
            d
            for d in os.listdir(dataset_path)
            if os.path.isdir(os.path.join(dataset_path, d))
        )
        if not classes:
            raise SystemExit(
                f"no class directories found under {dataset_path}"
            )
        os.makedirs(images_dir)
        for name in classes:
            os.rename(
                os.path.join(dataset_path, name),
                os.path.join(images_dir, name),
            )
    classes = sorted(
        d
        for d in os.listdir(images_dir)
        if os.path.isdir(os.path.join(images_dir, d))
    )

    label_map = {name: idx for idx, name in enumerate(classes)}
    with open(os.path.join(dataset_path, "label_map.json"), "w") as f:
        json.dump(label_map, f, indent=4)

    splits = {"train": [], "val": [], "test": []}
    for name in classes:
        images = sorted(os.listdir(os.path.join(images_dir, name)))
        n = len(images)
        n_train = int(n * train_frac)
        n_val = int(n * val_frac)
        splits["train"] += [
            f"images/{name}/{img}" for img in images[:n_train]
        ]
        splits["val"] += [
            f"images/{name}/{img}"
            for img in images[n_train : n_train + n_val]
        ]
        splits["test"] += [
            f"images/{name}/{img}" for img in images[n_train + n_val :]
        ]

    for split, paths in splits.items():
        out = os.path.join(dataset_path, f"{split}_imagepaths.txt")
        with open(out, "w") as f:
            f.write("\n".join(paths) + "\n")
        print(f"{split}: {len(paths)} images -> {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--dataset_path",
        type=str,
        default="NWPU-RESISC45",
        help="Root of the extracted NWPU-RESISC45 dataset "
        "(one directory per class)",
    )
    args = parser.parse_args()
    prepare(args.dataset_path)
