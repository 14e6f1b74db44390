"""pycocotools.coco.COCO shim (bbox annotations only).

Implements the subset used by the reference stack and the torchvision
CocoDetection shim: index construction, getAnnIds/getCatIds/getImgIds,
loadAnns/loadImgs/loadCats, and loadRes for detection results.
"""
import copy
import json
from collections import defaultdict


class COCO:
    def __init__(self, annotation_file=None):
        self.dataset = {}
        self.anns = {}
        self.imgs = {}
        self.cats = {}
        self.imgToAnns = defaultdict(list)
        self.catToImgs = defaultdict(list)
        if annotation_file is not None:
            if isinstance(annotation_file, dict):
                self.dataset = annotation_file
            else:
                with open(annotation_file) as f:
                    self.dataset = json.load(f)
            assert isinstance(self.dataset, dict)
            self.createIndex()

    def createIndex(self):
        anns, cats, imgs = {}, {}, {}
        imgToAnns = defaultdict(list)
        catToImgs = defaultdict(list)
        for ann in self.dataset.get("annotations", []):
            imgToAnns[ann["image_id"]].append(ann)
            anns[ann["id"]] = ann
        for img in self.dataset.get("images", []):
            imgs[img["id"]] = img
        for cat in self.dataset.get("categories", []):
            cats[cat["id"]] = cat
        for ann in self.dataset.get("annotations", []):
            catToImgs[ann["category_id"]].append(ann["image_id"])
        self.anns = anns
        self.imgs = imgs
        self.cats = cats
        self.imgToAnns = imgToAnns
        self.catToImgs = catToImgs

    def getAnnIds(self, imgIds=[], catIds=[], areaRng=[], iscrowd=None):
        imgIds = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
        catIds = catIds if isinstance(catIds, (list, tuple)) else [catIds]
        if len(imgIds) == 0 and len(catIds) == 0 and len(areaRng) == 0:
            anns = self.dataset.get("annotations", [])
        else:
            if len(imgIds) > 0:
                anns = [
                    a for i in imgIds for a in self.imgToAnns.get(i, [])
                ]
            else:
                anns = self.dataset.get("annotations", [])
            if len(catIds) > 0:
                cset = set(catIds)
                anns = [a for a in anns if a["category_id"] in cset]
            if len(areaRng) > 0:
                anns = [
                    a
                    for a in anns
                    if areaRng[0] < a["area"] < areaRng[1]
                ]
        if iscrowd is not None:
            anns = [a for a in anns if a.get("iscrowd", 0) == iscrowd]
        return [a["id"] for a in anns]

    def getCatIds(self, catNms=[], supNms=[], catIds=[]):
        cats = self.dataset.get("categories", [])
        if catNms:
            cats = [c for c in cats if c["name"] in catNms]
        if supNms:
            cats = [c for c in cats if c.get("supercategory") in supNms]
        if catIds:
            cset = set(catIds if isinstance(catIds, (list, tuple))
                       else [catIds])
            cats = [c for c in cats if c["id"] in cset]
        return [c["id"] for c in cats]

    def getImgIds(self, imgIds=[], catIds=[]):
        imgIds = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
        catIds = catIds if isinstance(catIds, (list, tuple)) else [catIds]
        if len(imgIds) == 0 and len(catIds) == 0:
            ids = set(self.imgs.keys())
        else:
            ids = set(imgIds) if imgIds else set(self.imgs.keys())
            for i, cat_id in enumerate(catIds):
                if i == 0 and not imgIds:
                    ids = set(self.catToImgs[cat_id])
                else:
                    ids &= set(self.catToImgs[cat_id])
        return list(ids)

    def loadAnns(self, ids=[]):
        if isinstance(ids, (list, tuple)):
            return [self.anns[i] for i in ids]
        return [self.anns[ids]]

    def loadImgs(self, ids=[]):
        if isinstance(ids, (list, tuple)):
            return [self.imgs[i] for i in ids]
        return [self.imgs[ids]]

    def loadCats(self, ids=[]):
        if isinstance(ids, (list, tuple)):
            return [self.cats[i] for i in ids]
        return [self.cats[ids]]

    def loadRes(self, resFile):
        """Build a results COCO from a list of detection dicts
        ({image_id, category_id, bbox xywh, score})."""
        res = COCO()
        res.dataset["images"] = [img for img in self.dataset["images"]]
        if isinstance(resFile, str):
            with open(resFile) as f:
                anns = json.load(f)
        else:
            anns = resFile
        assert isinstance(anns, list), "results must be a list"
        if len(anns):
            anns_img_ids = {a["image_id"] for a in anns}
            assert anns_img_ids <= set(self.getImgIds()), (
                "Results do not correspond to current coco set"
            )
        res.dataset["categories"] = copy.deepcopy(
            self.dataset.get("categories", [])
        )
        for i, ann in enumerate(anns):
            bb = ann["bbox"]
            ann["area"] = bb[2] * bb[3]
            ann["id"] = i + 1
            ann["iscrowd"] = ann.get("iscrowd", 0)
        res.dataset["annotations"] = anns
        res.createIndex()
        return res
