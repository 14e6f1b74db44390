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

    def test_against_pycocotools(self):
        """Differential test against pycocotools itself on random
        scenarios.  pycocotools is not installed in this image (C
        extension, no network egress) so the case auto-skips here, but the
        body is real and runs wherever pycocotools exists; the same random
        scenarios are also checked against an independent from-spec oracle
        in TestDifferentialOracle below, which always runs."""
        pycoco = pytest.importorskip("pycocotools.coco")
        cocoeval = pytest.importorskip("pycocotools.cocoeval")
        import contextlib
        import io

        for seed in range(3):
            gt_dict, preds = random_scenario(seed)
            ours = CocoEvaluator(CocoIndex(gt_dict))
            ours.update(preds)
            with contextlib.redirect_stdout(io.StringIO()):
                stats = ours.summarize()
                coco_gt = pycoco.COCO()
                coco_gt.dataset = gt_dict
                coco_gt.createIndex()
                results = []
                for img_id, p in preds.items():
                    for box, score, label in zip(
                        p["boxes"], p["scores"], p["labels"]
                    ):
                        x0, y0, x1, y1 = box
                        results.append(
                            {
                                "image_id": img_id,
                                "category_id": int(label),
                                "bbox": [x0, y0, x1 - x0, y1 - y0],
                                "score": float(score),
                            }
                        )
                coco_dt = coco_gt.loadRes(results)
                ev = cocoeval.COCOeval(coco_gt, coco_dt, "bbox")
                ev.evaluate()
                ev.accumulate()
                ev.summarize()
            np.testing.assert_allclose(
                stats, ev.stats, atol=1e-9, err_msg=f"seed={seed}"
            )


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


# ---------------------------------------------------------------------------
# Randomized differential testing
# ---------------------------------------------------------------------------


def random_scenario(seed, n_imgs=10, n_cats=3):
    """Random COCO gt dict + predictions: boxes spanning the small/medium/
    large area ranges, crowd regions, near-duplicate detections, and scores
    drawn from a small discrete set so tie-breaking rules are exercised."""
    rng = np.random.RandomState(1000 + seed)
    images, annotations = [], []
    preds = {}
    ann_id = 1
    for img_id in range(1, n_imgs + 1):
        images.append(
            {"id": img_id, "width": 640, "height": 640,
             "file_name": f"{img_id}.jpg"}
        )
        boxes, scores, labels = [], [], []
        for cat in range(1, n_cats + 1):
            for _ in range(rng.randint(0, 4)):
                side = rng.choice([12.0, 50.0, 150.0])
                w = side * rng.uniform(0.6, 1.6)
                h = side * rng.uniform(0.6, 1.6)
                x = rng.uniform(0, 640 - w)
                y = rng.uniform(0, 640 - h)
                crowd = int(rng.rand() < 0.15)
                annotations.append(
                    {
                        "id": ann_id, "image_id": img_id,
                        "category_id": cat,
                        "bbox": [x, y, w, h], "area": w * h,
                        "iscrowd": crowd,
                    }
                )
                ann_id += 1
                # detections near this gt (perturbed - mid IoUs) plus
                # occasional duplicates
                for _ in range(rng.randint(0, 3)):
                    dx, dy = rng.uniform(-0.4, 0.4, 2) * [w, h]
                    dw = w * rng.uniform(0.6, 1.5)
                    dh = h * rng.uniform(0.6, 1.5)
                    boxes.append(
                        [x + dx, y + dy, x + dx + dw, y + dy + dh]
                    )
                    scores.append(float(rng.choice([0.3, 0.5, 0.7, 0.9])))
                    labels.append(cat)
            # pure false positives
            for _ in range(rng.randint(0, 2)):
                w, h = rng.uniform(10, 120, 2)
                x = rng.uniform(0, 640 - w)
                y = rng.uniform(0, 640 - h)
                boxes.append([x, y, x + w, y + h])
                scores.append(float(rng.choice([0.3, 0.5, 0.7, 0.9])))
                labels.append(cat)
        preds[img_id] = {
            "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
            "scores": np.asarray(scores, np.float64),
            "labels": np.asarray(labels, np.int64),
        }
    gt_dict = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": c, "name": str(c)} for c in range(1, n_cats + 1)
        ],
    }
    return gt_dict, preds


def oracle_stats(gt_dict, preds):
    """Independent from-spec transcription of the published COCOeval bbox
    protocol (pycocotools cocoeval.py: evaluateImg -> accumulate ->
    summarize), kept deliberately separate from
    myrtle_vision_tpu.eval.coco_eval as a differential oracle."""
    iou_thrs = np.linspace(0.5, 0.95, 10)
    rec_thrs = np.linspace(0.0, 1.0, 101)
    max_dets = [1, 10, 100]
    area_rngs = [
        (0.0, 1e10), (0.0, 32.0 ** 2), (32.0 ** 2, 96.0 ** 2),
        (96.0 ** 2, 1e10),
    ]
    img_ids = sorted(i["id"] for i in gt_dict["images"])
    cat_ids = sorted(c["id"] for c in gt_dict["categories"])
    T, R, K, A, M = (
        len(iou_thrs), len(rec_thrs), len(cat_ids), len(area_rngs),
        len(max_dets),
    )

    def bbox_iou(d, g, crowd):
        # xywh IoU, union = det area for crowd gt (maskUtils.iou semantics)
        out = np.zeros((len(d), len(g)))
        for di, db in enumerate(d):
            for gi, gb in enumerate(g):
                ix = max(
                    0.0,
                    min(db[0] + db[2], gb[0] + gb[2]) - max(db[0], gb[0]),
                )
                iy = max(
                    0.0,
                    min(db[1] + db[3], gb[1] + gb[3]) - max(db[1], gb[1]),
                )
                inter = ix * iy
                da = db[2] * db[3]
                ga = gb[2] * gb[3]
                u = da if crowd[gi] else da + ga - inter
                out[di, gi] = inter / u if u > 0 else 0.0
        return out

    # per-(img, cat) gt and dt lists
    gts = {(i, c): [] for i in img_ids for c in cat_ids}
    for a in gt_dict["annotations"]:
        gts[(a["image_id"], a["category_id"])].append(a)
    dts = {(i, c): [] for i in img_ids for c in cat_ids}
    for img_id, p in preds.items():
        for box, score, label in zip(p["boxes"], p["scores"], p["labels"]):
            x0, y0, x1, y1 = box
            dts[(img_id, int(label))].append(
                {"bbox": [x0, y0, x1 - x0, y1 - y0], "score": float(score),
                 "area": (x1 - x0) * (y1 - y0)}
            )

    def evaluate_img(gt, dt, arng, max_det):
        for g in gt:
            g["_ignore"] = g["iscrowd"] or (
                g["area"] < arng[0] or g["area"] > arng[1]
            )
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort(
            [-d["score"] for d in dt], kind="mergesort"
        )[:max_det]
        dt = [dt[i] for i in dtind]
        iscrowd = [int(g["iscrowd"]) for g in gt]
        ious = bbox_iou(
            [d["bbox"] for d in dt], [g["bbox"] for g in gt], iscrowd
        )
        G, D = len(gt), len(dt)
        gtIg = np.array([g["_ignore"] for g in gt])
        gtm = np.zeros((T, G)) - 1
        dtm = np.zeros((T, D)) - 1
        dtIg = np.zeros((T, D))
        for tind, t in enumerate(iou_thrs):
            for dind in range(D):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] >= 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dtIg[tind, dind] = gtIg[m]
                dtm[tind, dind] = m
                gtm[tind, m] = dind
        a = np.array(
            [d["area"] < arng[0] or d["area"] > arng[1] for d in dt]
        ).reshape(1, len(dt))
        dtIg = np.logical_or(
            dtIg, np.logical_and(dtm == -1, np.repeat(a, T, 0))
        )
        return {
            "dtMatches": dtm,
            "dtIgnore": dtIg,
            "gtIgnore": gtIg,
            "dtScores": [d["score"] for d in dt],
        }

    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for ki, cat in enumerate(cat_ids):
        for ai, arng in enumerate(area_rngs):
            for mi, max_det in enumerate(max_dets):
                E = [
                    evaluate_img(
                        [dict(g) for g in gts[(i, cat)]],
                        list(dts[(i, cat)]),
                        arng,
                        max_det,
                    )
                    for i in img_ids
                ]
                dt_scores = np.concatenate([e["dtScores"] for e in E])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"] for e in E], axis=1
                )[:, inds]
                dtIg = np.concatenate(
                    [e["dtIgnore"] for e in E], axis=1
                )[:, inds]
                gtIg = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gtIg == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm >= 0, np.logical_not(dtIg))
                fps = np.logical_and(dtm == -1, np.logical_not(dtIg))
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros(R)
                    recall[t, ki, ai, mi] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    pinds = np.searchsorted(rc, rec_thrs, side="left")
                    for ri, pi in enumerate(pinds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    precision[t, :, ki, ai, mi] = q

    def summ(ap, iou=None, ai=0, mi=2):
        if ap:
            s = precision if iou is None else precision[
                np.where(np.isclose(iou_thrs, iou))[0]
            ]
            s = s[:, :, :, ai, mi]
        else:
            s = recall if iou is None else recall[
                np.where(np.isclose(iou_thrs, iou))[0]
            ]
            s = s[:, :, ai, mi]
        v = s[s > -1]
        return float(np.mean(v)) if v.size else -1.0

    return np.array(
        [
            summ(1), summ(1, 0.5), summ(1, 0.75), summ(1, None, 1),
            summ(1, None, 2), summ(1, None, 3), summ(0, None, 0, 0),
            summ(0, None, 0, 1), summ(0), summ(0, None, 1),
            summ(0, None, 2), summ(0, None, 3),
        ]
    )


class TestGoldenFixture:
    """Frozen scenario + the 12 expected stats derived BY HAND from the
    published COCOeval protocol (see tests/data/coco_golden.json for the
    full derivation).  Unlike the pycocotools differential test above,
    this anchor is committed data and runs in every environment; unlike
    TestDifferentialOracle, the expected values were not produced by any
    code in this repo."""

    def _load(self):
        import json
        import os

        path = os.path.join(
            os.path.dirname(__file__), "data", "coco_golden.json"
        )
        with open(path) as f:
            fx = json.load(f)
        preds = {
            int(img_id): {
                "boxes": np.asarray(p["boxes_xyxy"], np.float64).reshape(
                    -1, 4
                ),
                "scores": np.asarray(p["scores"], np.float64),
                "labels": np.asarray(p["labels"], np.int64),
            }
            for img_id, p in fx["predictions"].items()
        }
        return fx["gt"], preds, np.asarray(fx["expected_stats"])

    def test_evaluator_reproduces_hand_derived_stats(self):
        import contextlib
        import io

        gt_dict, preds, expected = self._load()
        ev = CocoEvaluator(CocoIndex(gt_dict))
        ev.update(preds)
        with contextlib.redirect_stdout(io.StringIO()):
            stats = ev.summarize()
        np.testing.assert_allclose(stats, expected, atol=1e-9)

    def test_oracle_reproduces_hand_derived_stats(self):
        # the from-spec oracle must agree with the hand derivation too —
        # anchors the oracle itself, which the random differential tests
        # below then propagate to arbitrary scenarios
        gt_dict, preds, expected = self._load()
        np.testing.assert_allclose(
            oracle_stats(gt_dict, preds), expected, atol=1e-9
        )


class TestDifferentialOracle:
    @pytest.mark.parametrize("seed", range(5))
    def test_random_scenarios_match_from_spec_oracle(self, seed):
        gt_dict, preds = random_scenario(seed)
        import contextlib
        import io

        ev = CocoEvaluator(CocoIndex(gt_dict))
        ev.update(preds)
        with contextlib.redirect_stdout(io.StringIO()):
            stats = ev.summarize()
        expected = oracle_stats(gt_dict, preds)
        np.testing.assert_allclose(stats, expected, atol=1e-9)


class TestPycocotoolsShim:
    """The refcontrol pycocotools SHIM (tools/refcontrol/shims/
    pycocotools) driven through the REFERENCE'S OWN CocoEvaluator +
    vendored evaluate() (reference datasets/coco_eval.py:25-264) must
    reproduce our evaluator's numbers — this is the exact code path the
    detection cross-stack control runs."""

    @pytest.fixture()
    def ref_eval(self):
        import os
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        shims = os.path.join(repo, "tools", "refcontrol", "shims")
        for p in (shims, "/root/reference/src"):
            if p not in sys.path:
                sys.path.insert(0, p)
        torch = pytest.importorskip("torch")
        from myrtle_vision.datasets import coco_eval as ref_coco_eval
        from pycocotools.coco import COCO

        def run(gt_dict, preds):
            import contextlib
            import io

            coco_gt = COCO(
                {k: v for k, v in gt_dict.items()}
            )
            ev = ref_coco_eval.CocoEvaluator(coco_gt, ["bbox"])
            for img_id, p in preds.items():
                ev.update(
                    {
                        img_id: {
                            "boxes": torch.as_tensor(
                                np.asarray(p["boxes"], np.float64)
                            ).reshape(-1, 4),
                            "scores": torch.as_tensor(
                                np.asarray(p["scores"], np.float64)
                            ),
                            "labels": torch.as_tensor(
                                np.asarray(p["labels"], np.int64)
                            ),
                        }
                    }
                )
            ev.synchronize_between_processes()
            ev.accumulate()
            with contextlib.redirect_stdout(io.StringIO()):
                ev.summarize()
            return np.asarray(ev.coco_eval["bbox"].stats)

        return run

    def test_golden_fixture_through_reference_evaluator(self, ref_eval):
        import contextlib
        import io
        import json
        import os

        path = os.path.join(
            os.path.dirname(__file__), "data", "coco_golden.json"
        )
        with open(path) as f:
            fx = json.load(f)
        preds = {
            int(i): {
                "boxes": p["boxes_xyxy"],
                "scores": p["scores"],
                "labels": p["labels"],
            }
            for i, p in fx["predictions"].items()
        }
        stats = ref_eval(fx["gt"], preds)
        np.testing.assert_allclose(
            stats, np.asarray(fx["expected_stats"]), atol=1e-9
        )

    @pytest.mark.parametrize("seed", range(3))
    def test_random_scenarios_match_our_evaluator(self, ref_eval, seed):
        import contextlib
        import io

        gt_dict, preds = random_scenario(seed)
        ours = CocoEvaluator(CocoIndex(gt_dict))
        ours.update(preds)
        with contextlib.redirect_stdout(io.StringIO()):
            stats_ours = ours.summarize()
        stats_shim = ref_eval(gt_dict, preds)
        np.testing.assert_allclose(
            stats_shim, stats_ours, atol=1e-9, err_msg=f"seed={seed}"
        )
