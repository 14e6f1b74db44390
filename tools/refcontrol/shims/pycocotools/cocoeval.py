"""pycocotools.cocoeval.COCOeval shim — the bbox evaluation protocol
with pycocotools' internal API shape.

The reference's vendored ``evaluate()`` (datasets/coco_eval.py:219-264)
drives these internals directly: ``params`` (imgIds/catIds/iouThrs/
recThrs/maxDets/areaRng/useCats/useSegm), ``_prepare()``,
``computeIoU(imgId, catId)``, ``evaluateImg(imgId, catId, aRng,
maxDet)``; ``create_common_coco_eval`` then assigns the flattened
(K, A, I)-ordered ``evalImgs`` + ``_paramsEval`` that ``accumulate()``
consumes, and ``summarize()`` prints the standard 12-number summary
into ``stats``.

Protocol implementation mirrors myrtle_vision_tpu/eval/coco_eval.py
(greedy per-image matching in score order, crowd/ignore semantics,
101-point interpolated precision), reorganized into this API.
"""
import copy
from collections import defaultdict

import numpy as np


class Params:
    def setDetParams(self):
        self.imgIds = []
        self.catIds = []
        self.iouThrs = np.linspace(
            0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1
        )
        self.recThrs = np.linspace(
            0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1
        )
        self.maxDets = [1, 10, 100]
        self.areaRng = [
            [0 ** 2, 1e5 ** 2],
            [0 ** 2, 32 ** 2],
            [32 ** 2, 96 ** 2],
            [96 ** 2, 1e5 ** 2],
        ]
        self.areaRngLbl = ["all", "small", "medium", "large"]
        self.useCats = 1

    def __init__(self, iouType="bbox"):
        if iouType in ("segm", "bbox"):
            self.setDetParams()
        else:
            raise Exception("iouType not supported")
        self.iouType = iouType
        self.useSegm = None


def _iou_xywh(dt, gt, iscrowd):
    """Pairwise IoU on xywh boxes; crowd GT uses det area as denominator."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dt = np.asarray(dt, np.float64)
    gt = np.asarray(gt, np.float64)
    d_xy, d_wh = dt[:, :2], dt[:, 2:]
    g_xy, g_wh = gt[:, :2], gt[:, 2:]
    lt = np.maximum(d_xy[:, None], g_xy[None, :])
    rb = np.minimum(
        (d_xy + d_wh)[:, None], (g_xy + g_wh)[None, :]
    )
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = d_wh[:, 0] * d_wh[:, 1]
    area_g = g_wh[:, 0] * g_wh[:, 1]
    union = area_d[:, None] + area_g[None, :] - inter
    union = np.where(
        np.asarray(iscrowd, bool)[None, :], area_d[:, None], union
    )
    return inter / np.maximum(union, 1e-12)


class COCOeval:
    def __init__(self, cocoGt=None, cocoDt=None, iouType="bbox"):
        assert iouType == "bbox", "shim implements the bbox protocol only"
        self.cocoGt = cocoGt
        self.cocoDt = cocoDt
        self.evalImgs = []
        self.eval = {}
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        self.params = Params(iouType=iouType)
        self._paramsEval = {}
        self.stats = []
        self.ious = {}
        if cocoGt is not None:
            self.params.imgIds = sorted(cocoGt.getImgIds())
            self.params.catIds = sorted(cocoGt.getCatIds())

    def _prepare(self):
        p = self.params
        if p.useCats:
            gts = self.cocoGt.loadAnns(
                self.cocoGt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds)
            )
            dts = self.cocoDt.loadAnns(
                self.cocoDt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds)
            )
        else:
            gts = self.cocoGt.loadAnns(
                self.cocoGt.getAnnIds(imgIds=p.imgIds)
            )
            dts = self.cocoDt.loadAnns(
                self.cocoDt.getAnnIds(imgIds=p.imgIds)
            )
        for gt in gts:
            gt["ignore"] = gt.get("ignore", 0) or gt.get("iscrowd", 0)
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for gt in gts:
            self._gts[gt["image_id"], gt["category_id"]].append(gt)
        for dt in dts:
            self._dts[dt["image_id"], dt["category_id"]].append(dt)
        self.evalImgs = defaultdict(list)
        self.eval = {}

    def computeIoU(self, imgId, catId):
        p = self.params
        if p.useCats:
            gt = self._gts[imgId, catId]
            dt = self._dts[imgId, catId]
        else:
            gt = [g for (i, _), v in self._gts.items() if i == imgId
                  for g in v]
            dt = [d for (i, _), v in self._dts.items() if i == imgId
                  for d in v]
        if len(gt) == 0 and len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[: p.maxDets[-1]]
        g = [g["bbox"] for g in gt]
        d = [d["bbox"] for d in dt]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        return _iou_xywh(d, g, iscrowd)

    def evaluateImg(self, imgId, catId, aRng, maxDet):
        p = self.params
        if p.useCats:
            gt = self._gts[imgId, catId]
            dt = self._dts[imgId, catId]
        else:
            gt = [g for (i, _), v in self._gts.items() if i == imgId
                  for g in v]
            dt = [d for (i, _), v in self._dts.items() if i == imgId
                  for d in v]
        if len(gt) == 0 and len(dt) == 0:
            return None

        for g in gt:
            if g["ignore"] or g["area"] < aRng[0] or g["area"] > aRng[1]:
                g["_ignore"] = 1
            else:
                g["_ignore"] = 0
        # sort gt: non-ignored first; dt by descending score (stable, so
        # the row order matches computeIoU's)
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:maxDet]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        ious = (
            self.ious[imgId, catId][:, gtind]
            if len(self.ious[imgId, catId]) > 0
            else self.ious[imgId, catId]
        )

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious) != 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind in range(G):
                        # gt already matched, and not a crowd
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        # best match so far is non-ignored; rest are
                        # ignored (sorted) -> stop
                        if (
                            m > -1
                            and gtIg[m] == 0
                            and gtIg[gind] == 1
                        ):
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        # unmatched dets outside the area range are ignored
        a = np.array(
            [
                d["area"] < aRng[0] or d["area"] > aRng[1]
                for d in dt
            ]
        ).reshape((1, len(dt)))
        dtIg = np.logical_or(
            dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0))
        )
        return {
            "image_id": imgId,
            "category_id": catId,
            "aRng": aRng,
            "maxDet": maxDet,
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def accumulate(self, p=None):
        if not self.evalImgs:
            print("Please run evaluate() first")
        if p is None:
            p = self.params
        p.catIds = p.catIds if p.useCats == 1 else [-1]
        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(p.catIds)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        _pe = self._paramsEval
        catIds = _pe.catIds if _pe.useCats else [-1]
        setK = set(catIds)
        setA = set(map(tuple, _pe.areaRng))
        setM = set(_pe.maxDets)
        setI = set(_pe.imgIds)
        k_list = [
            n for n, k in enumerate(p.catIds) if k in setK
        ]
        m_list = [m for n, m in enumerate(p.maxDets) if m in setM]
        a_list = [
            n
            for n, a in enumerate(
                map(lambda x: tuple(x), p.areaRng)
            )
            if a in setA
        ]
        i_list = [n for n, i in enumerate(p.imgIds) if i in setI]
        I0 = len(_pe.imgIds)
        A0 = len(_pe.areaRng)
        for k, k0 in enumerate(k_list):
            Nk = k0 * A0 * I0
            for a, a0 in enumerate(a_list):
                Na = a0 * I0
                for m, maxDet in enumerate(m_list):
                    E = [self.evalImgs[Nk + Na + i] for i in i_list]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [e["dtScores"][0:maxDet] for e in E]
                    )
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtScoresSorted = dtScores[inds]
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:maxDet] for e in E],
                        axis=1,
                    )[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:maxDet] for e in E],
                        axis=1,
                    )[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dtIg)
                    )
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        tp = np.array(tp)
                        fp = np.array(fp)
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        ss = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(
                            rc, p.recThrs, side="left"
                        )
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                                ss[ri] = dtScoresSorted[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
                        scores[t, :, k, a, m] = np.array(ss)
        self.eval = {
            "params": p,
            "counts": [T, R, K, A, M],
            "precision": precision,
            "recall": recall,
            "scores": scores,
        }

    def summarize(self):
        def _summarize(ap=1, iouThr=None, areaRng="all", maxDets=100):
            p = self.params
            iStr = (
                " {:<18} {} @[ IoU={:<9} | area={:>6s} | "
                "maxDets={:>3d} ] = {:0.3f}"
            )
            titleStr = (
                "Average Precision" if ap == 1 else "Average Recall"
            )
            typeStr = "(AP)" if ap == 1 else "(AR)"
            iouStr = (
                "{:0.2f}:{:0.2f}".format(p.iouThrs[0], p.iouThrs[-1])
                if iouThr is None
                else "{:0.2f}".format(iouThr)
            )
            aind = [
                i
                for i, aRng in enumerate(p.areaRngLbl)
                if aRng == areaRng
            ]
            mind = [
                i for i, mDet in enumerate(p.maxDets) if mDet == maxDets
            ]
            if ap == 1:
                s = self.eval["precision"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, :, aind, mind]
            else:
                s = self.eval["recall"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, aind, mind]
            if len(s[s > -1]) == 0:
                mean_s = -1
            else:
                mean_s = np.mean(s[s > -1])
            print(
                iStr.format(
                    titleStr, typeStr, iouStr, areaRng, maxDets, mean_s
                )
            )
            return mean_s

        if not self.eval:
            raise Exception("Please run accumulate() first")
        stats = np.zeros((12,))
        stats[0] = _summarize(1)
        stats[1] = _summarize(
            1, iouThr=0.5, maxDets=self.params.maxDets[2]
        )
        stats[2] = _summarize(
            1, iouThr=0.75, maxDets=self.params.maxDets[2]
        )
        stats[3] = _summarize(
            1, areaRng="small", maxDets=self.params.maxDets[2]
        )
        stats[4] = _summarize(
            1, areaRng="medium", maxDets=self.params.maxDets[2]
        )
        stats[5] = _summarize(
            1, areaRng="large", maxDets=self.params.maxDets[2]
        )
        stats[6] = _summarize(0, maxDets=self.params.maxDets[0])
        stats[7] = _summarize(0, maxDets=self.params.maxDets[1])
        stats[8] = _summarize(0, maxDets=self.params.maxDets[2])
        stats[9] = _summarize(
            0, areaRng="small", maxDets=self.params.maxDets[2]
        )
        stats[10] = _summarize(
            0, areaRng="medium", maxDets=self.params.maxDets[2]
        )
        stats[11] = _summarize(
            0, areaRng="large", maxDets=self.params.maxDets[2]
        )
        self.stats = stats

    def __str__(self):
        self.summarize()
        return ""
