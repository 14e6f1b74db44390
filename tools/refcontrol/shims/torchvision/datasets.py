"""torchvision.datasets shim: CocoDetection (pycocotools-shim backed).

Surface used by the reference's detection dataset
(src/myrtle_vision/datasets/coco.py:15-27): construction with
(img_folder, ann_file), ``.coco`` (a pycocotools COCO), ``.ids``, and
``__getitem__ -> (PIL RGB image, [annotation dicts])``.
"""
import os

from PIL import Image

from pycocotools.coco import COCO


class CocoDetection:
    def __init__(self, root, annFile, transform=None, target_transform=None,
                 transforms=None):
        self.root = str(root)
        self.coco = COCO(str(annFile))
        self.ids = sorted(self.coco.imgs.keys())
        self.transform = transform
        self.target_transform = target_transform
        self.transforms = transforms

    def _load_image(self, idx):
        path = self.coco.loadImgs(idx)[0]["file_name"]
        return Image.open(os.path.join(self.root, path)).convert("RGB")

    def _load_target(self, idx):
        return self.coco.loadAnns(self.coco.getAnnIds(imgIds=idx))

    def __getitem__(self, index):
        idx = self.ids[index]
        image = self._load_image(idx)
        target = self._load_target(idx)
        if self.transforms is not None:
            image, target = self.transforms(image, target)
        return image, target

    def __len__(self):
        return len(self.ids)
