#!/usr/bin/env python
"""Prepare the DLRSD segmentation dataset from the UCMerced + DLRSD zips.

Reference parity (reference: segmentation/prepare_dlrsd.py): extracts both
zips into ``DLRSD_dataset/``, builds per-class seeded random 70/10/20
train/val/test splits of (image, segmap) path pairs written as CSV split
files, and writes the fixed 17-class label map.  The per-class shuffle uses
``random.seed(0)`` with a fresh permutation per category, matching the
reference's split determinism.
"""
import argparse
import json
import random
import sys
from pathlib import Path
from zipfile import ZipFile

SPLITS = [("train", 0.7), ("val", 0.1), ("test", 0.2)]

LABEL_MAP = {
    "airplane": 0,
    "bare soil": 1,
    "buildings": 2,
    "cars": 3,
    "chaparral": 4,
    "court": 5,
    "dock": 6,
    "field": 7,
    "grass": 8,
    "mobile home": 9,
    "pavement": 10,
    "sand": 11,
    "sea": 12,
    "ship": 13,
    "tanks": 14,
    "trees": 15,
    "water": 16,
}


def main(ucmerced_zip: str, dlrsd_zip: str, out_dir: str):
    random.seed(0)
    ucmerced_zip = Path(ucmerced_zip)
    dlrsd_zip = Path(dlrsd_zip)
    if not ucmerced_zip.exists() or not dlrsd_zip.exists():
        print(
            "Error: Could not find the UCMerced and DLRSD datasets in zip "
            "format."
        )
        sys.exit(1)

    out = Path(out_dir)
    print(f"Creating {out}")
    out.mkdir()
    for zpath in (ucmerced_zip, dlrsd_zip):
        print(f"Extracting {zpath} to {out}")
        with ZipFile(zpath) as z:
            z.extractall(out)

    images_dir = out / "UCMerced_LandUse" / "Images"
    labels_dir = out / "DLRSD" / "Images"
    categories = sorted(p.name for p in images_dir.iterdir() if p.is_dir())

    split_pairs = {name: [] for name, _ in SPLITS}
    for category in categories:
        # fresh per-category permutation: UCMerced/DLRSD directories are
        # "sorted" (similar images adjacent), so slicing without shuffling
        # would bias the splits
        perm = list(range(100))
        random.shuffle(perm)
        pairs = list(
            zip(
                sorted((images_dir / category).iterdir()),
                sorted((labels_dir / category).iterdir()),
            )
        )
        pos = 0.0
        for name, frac in SPLITS:
            lo = int(pos * len(pairs))
            hi = int((pos + frac) * len(pairs))
            split_pairs[name].extend(pairs[perm[k]] for k in range(lo, hi))
            pos += frac

    for name, _ in SPLITS:
        path = out / f"{name}_imagepaths.txt"
        print(f"Creating image paths file {path}")
        lines = [
            f"{img.relative_to(out)},{seg.relative_to(out)}"
            for img, seg in split_pairs[name]
        ]
        path.write_text("\n".join(lines))

    label_map_path = out / "label_map.json"
    print(f"Creating label map file {label_map_path}")
    label_map_path.write_text(json.dumps(LABEL_MAP))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ucmerced_zip", default="UCMerced_LandUse.zip")
    parser.add_argument("--dlrsd_zip", default="DLRSD.zip")
    parser.add_argument("--out_dir", default="DLRSD_dataset")
    args = parser.parse_args()
    main(args.ucmerced_zip, args.dlrsd_zip, args.out_dir)
