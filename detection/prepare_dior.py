#!/usr/bin/env python
"""Convert the DIOR dataset zips into COCO format.

Reference parity (reference: detection/prepare_dior.py): reads the
train/val/test image-id lists from ImageSets.zip, parses the horizontal
bounding-box VOC XML annotations from Annotations.zip, asserts 800x800
images, and writes COCO JSON per split (20 classes, ids = index into the
sorted class list) to ``<output>/annotations/{split}.json`` plus the images
extracted into ``<output>/{split}/``.

Expected input directory:
    Annotations.zip  ImageSets.zip
    JPEGImages-test.zip  JPEGImages-trainval.zip
"""
import argparse
import json
import sys
import tempfile
import xml.etree.ElementTree as ET
import zipfile
from pathlib import Path

DIOR_CLASSES = [
    "airplane",
    "airport",
    "baseballfield",
    "basketballcourt",
    "bridge",
    "chimney",
    "dam",
    "Expressway-Service-area",
    "Expressway-toll-station",
    "golffield",
    "groundtrackfield",
    "harbor",
    "overpass",
    "ship",
    "stadium",
    "storagetank",
    "tenniscourt",
    "trainstation",
    "vehicle",
    "windmill",
]


def parse_voc_xml(path):
    """VOC XML -> (filename, width, height, [(name, xmin, ymin, xmax, ymax)])."""
    root = ET.parse(path).getroot()
    filename = root.findtext("filename")
    size = root.find("size")
    width = int(size.findtext("width"))
    height = int(size.findtext("height"))
    objects = []
    for obj in root.iter("object"):
        bnd = obj.find("bndbox")
        objects.append(
            (
                obj.findtext("name"),
                int(bnd.findtext("xmin")),
                int(bnd.findtext("ymin")),
                int(bnd.findtext("xmax")),
                int(bnd.findtext("ymax")),
            )
        )
    return filename, width, height, objects


def main(dior_dir: Path, output_dir: Path):
    if output_dir.exists() and next(output_dir.iterdir(), None) is not None:
        print(
            f"Error: Output directory {output_dir} must not exist or must "
            "be empty."
        )
        sys.exit(1)

    imagesets = {}
    with zipfile.ZipFile(dior_dir / "ImageSets.zip") as z:
        for split in ("train", "val", "test"):
            text = z.read(f"Main/{split}.txt").decode("utf-8")
            imagesets[split] = [
                line for line in text.replace("\r\n", "\n").split("\n")
                if line.strip()
            ]

    ann_dir = output_dir / "annotations"
    ann_dir.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(dior_dir / "Annotations.zip") as ann_zip:
        for split in ("train", "val", "test"):
            coco = {
                "info": {},
                "images": [],
                "annotations": [],
                "licenses": [],
                "categories": [
                    {"supercategory": name, "id": i, "name": name}
                    for i, name in enumerate(DIOR_CLASSES)
                ],
            }
            ann_id = 0
            for image_id in imagesets[split]:
                member = (
                    f"Annotations/Horizontal Bounding Boxes/{image_id}.xml"
                )
                with ann_zip.open(member) as f:
                    filename, width, height, objects = parse_voc_xml(f)
                assert (width, height) == (800, 800), (
                    f"{image_id}: expected 800x800, got {width}x{height}"
                )
                coco["images"].append(
                    {
                        "id": int(image_id),
                        "width": width,
                        "height": height,
                        "file_name": filename,
                    }
                )
                for name, xmin, ymin, xmax, ymax in objects:
                    w, h = xmax - xmin, ymax - ymin
                    coco["annotations"].append(
                        {
                            "id": ann_id,
                            "image_id": int(image_id),
                            "category_id": DIOR_CLASSES.index(name),
                            "segmentation": [],
                            "area": w * h,
                            "bbox": [xmin, ymin, w, h],
                            "iscrowd": 0,
                        }
                    )
                    ann_id += 1
            out_file = ann_dir / f"{split}.json"
            with open(out_file, "w") as f:
                json.dump(coco, f, indent=2)
            print(f"Written {split} annotations to {out_file}")

    with tempfile.TemporaryDirectory(prefix="DIOR-JPEGImages-") as tmp:
        for split in ("train", "val", "test"):
            coarse = "trainval" if split in ("train", "val") else "test"
            members = [
                f"JPEGImages-{coarse}/{image_id}.jpg"
                for image_id in imagesets[split]
            ]
            with zipfile.ZipFile(
                dior_dir / f"JPEGImages-{coarse}.zip"
            ) as z:
                print(f"Extracting {split} images... ", end="", flush=True)
                z.extractall(path=tmp, members=members)
            print("Done")
            split_dir = output_dir / split
            split_dir.mkdir(parents=True, exist_ok=True)
            for image_id in imagesets[split]:
                (Path(tmp) / f"JPEGImages-{coarse}" / f"{image_id}.jpg"
                 ).rename(split_dir / f"{image_id}.jpg")
            print(f"Moved {split} images to {split_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawTextHelpFormatter,
    )
    parser.add_argument(
        "dior_dir", type=Path, help="Directory containing DIOR zip files"
    )
    parser.add_argument(
        "output_dir", type=Path,
        help="Directory to write the converted dataset to",
    )
    args = parser.parse_args()
    main(args.dior_dir, args.output_dir)
