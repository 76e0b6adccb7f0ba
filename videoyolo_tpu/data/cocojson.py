"""Self-contained COCO json index + bbox evaluator (no pycocotools).

The reference depends on the pycocotools C extension for dataset indexing and
COCOeval (`/root/reference/datasets/mscoco.py:160-166`,
`/root/reference/metrics/mscoco.py:100-115`).  This environment has no
pycocotools, so the TPU build owns both pieces:

  * `CocoIndex` — minimal COCO api: image/annotation/category lookups and
    `load_results` for detection-result jsons;
  * `CocoEval` — a numpy implementation of the COCO bbox evaluation protocol
    (IoU thresholds .5:.05:.95, 101-point recall interpolation, area ranges
    all/small/medium/large, maxDets (1,10,100), crowd/ignore semantics).

`metrics/mscoco.py` prefers pycocotools when importable and falls back here.
"""
from __future__ import annotations

import copy
import json
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

__all__ = ["CocoIndex", "CocoEval", "bbox_iou_xywh"]


class CocoIndex:
    """Minimal COCO dataset index over an annotations json."""

    def __init__(self, annotation_file: Optional[str] = None, dataset: Optional[dict] = None):
        if dataset is None:
            with open(annotation_file) as f:
                dataset = json.load(f)
        self.dataset = dataset
        self.imgs: Dict = {img["id"]: img for img in dataset.get("images", [])}
        self.cats: Dict = {c["id"]: c for c in dataset.get("categories", [])}
        self.anns: Dict = {}
        self.img_to_anns = defaultdict(list)
        for ann in dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self.img_to_anns[ann["image_id"]].append(ann)

    def get_cat_ids(self) -> List:
        return [c["id"] for c in self.dataset.get("categories", [])]

    def get_img_ids(self) -> List:
        return list(self.imgs.keys())

    def load_imgs(self, ids) -> List[dict]:
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    def anns_for_img(self, img_id) -> List[dict]:
        return self.img_to_anns.get(img_id, [])

    def cat_names(self) -> List[str]:
        return [c["name"] for c in self.dataset.get("categories", [])]

    def load_results(self, results) -> "CocoIndex":
        """Detection results (list of dicts or json path) -> CocoIndex sharing
        this gt's images/categories (pycocotools COCO.loadRes equivalent)."""
        if isinstance(results, str):
            with open(results) as f:
                results = json.load(f)
        ds = {
            "images": list(self.dataset.get("images", [])),
            "categories": copy.deepcopy(self.dataset.get("categories", [])),
            "annotations": [],
        }
        for i, r in enumerate(results):
            x, y, w, h = r["bbox"]
            ds["annotations"].append(
                {
                    "id": i + 1,
                    "image_id": r["image_id"],
                    "category_id": r["category_id"],
                    "bbox": [x, y, w, h],
                    "area": w * h,
                    "score": r.get("score", 1.0),
                    "iscrowd": 0,
                }
            )
        return CocoIndex(dataset=ds)


def bbox_iou_xywh(dets: np.ndarray, gts: np.ndarray, iscrowd: Sequence[int]) -> np.ndarray:
    """(D,4) x (G,4) xywh IoU with COCO crowd semantics: IoU against a crowd
    gt is intersection / det_area (pycocotools maskUtils.iou)."""
    D, G = len(dets), len(gts)
    out = np.zeros((D, G))
    for g in range(G):
        gx, gy, gw, gh = gts[g]
        g_area = gw * gh
        for d in range(D):
            dx, dy, dw, dh = dets[d]
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            if iw <= 0:
                continue
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if ih <= 0:
                continue
            inter = iw * ih
            d_area = dw * dh
            union = d_area if iscrowd[g] else d_area + g_area - inter
            if union > 0:
                out[d, g] = inter / union
    return out


class CocoEval:
    """COCO bbox evaluation (pycocotools COCOeval-compatible protocol)."""

    def __init__(self, coco_gt: CocoIndex, coco_dt: CocoIndex, iou_type: str = "bbox"):
        assert iou_type == "bbox"
        self.cocoGt = coco_gt
        self.cocoDt = coco_dt
        self.params = _Params()
        self.params.img_ids = sorted(coco_gt.get_img_ids())
        self.params.cat_ids = sorted(coco_gt.get_cat_ids())
        self.eval = {}
        self.stats = np.zeros(12)

    # -- evaluate ----------------------------------------------------------
    def evaluate(self):
        p = self.params
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for img_id in p.img_ids:
            for ann in self.cocoGt.anns_for_img(img_id):
                self._gts[img_id, ann["category_id"]].append(ann)
            for ann in self.cocoDt.anns_for_img(img_id):
                self._dts[img_id, ann["category_id"]].append(ann)
        self.eval_imgs = {
            (img_id, cat_id, tuple(area)): self._evaluate_img(img_id, cat_id, area)
            for cat_id in p.cat_ids
            for area in p.area_rng
            for img_id in p.img_ids
        }

    def _evaluate_img(self, img_id, cat_id, area_rng):
        p = self.params
        gts = self._gts[img_id, cat_id]
        dts = self._dts[img_id, cat_id]
        if not gts and not dts:
            return None
        max_det = p.max_dets[-1]

        gt_ignore = np.array(
            [
                g.get("ignore", 0) or g.get("iscrowd", 0)
                or g["area"] < area_rng[0] or g["area"] > area_rng[1]
                for g in gts
            ],
            dtype=bool,
        )
        # sort gts: non-ignored first (pycocotools order)
        gt_order = np.argsort(gt_ignore, kind="stable")
        gts = [gts[i] for i in gt_order]
        gt_ignore = gt_ignore[gt_order]
        # sort dets by score desc, truncate to maxDet
        dt_order = np.argsort([-d["score"] for d in dts], kind="stable")[:max_det]
        dts = [dts[i] for i in dt_order]

        iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
        ious = (
            bbox_iou_xywh(
                np.array([d["bbox"] for d in dts], dtype=float),
                np.array([g["bbox"] for g in gts], dtype=float),
                iscrowd,
            )
            if dts and gts
            else np.zeros((len(dts), len(gts)))
        )

        T = len(p.iou_thrs)
        D, G = len(dts), len(gts)
        dt_matches = np.zeros((T, D), dtype=np.int64)
        dt_ignore = np.zeros((T, D), dtype=bool)
        gt_matches = np.zeros((T, G), dtype=np.int64)
        for t, thr in enumerate(p.iou_thrs):
            for d in range(D):
                iou = min(thr, 1 - 1e-10)
                m = -1
                for g in range(G):
                    if gt_matches[t, g] > 0 and not iscrowd[g]:
                        continue
                    # best non-ignored match ends the search over ignored gts
                    if m > -1 and not gt_ignore[m] and gt_ignore[g]:
                        break
                    if ious[d, g] < iou:
                        continue
                    iou = ious[d, g]
                    m = g
                if m == -1:
                    continue
                dt_ignore[t, d] = gt_ignore[m]
                dt_matches[t, d] = gts[m]["id"]
                gt_matches[t, m] = dts[d]["id"]
        # unmatched dets outside the area range are ignored
        dt_areas = np.array([d["bbox"][2] * d["bbox"][3] for d in dts])
        out_of_rng = (dt_areas < area_rng[0]) | (dt_areas > area_rng[1])
        dt_ignore = dt_ignore | (out_of_rng[None, :] & (dt_matches == 0))
        return {
            "dt_scores": np.array([d["score"] for d in dts]),
            "dt_matches": dt_matches,
            "dt_ignore": dt_ignore,
            "gt_ignore": gt_ignore,
            "num_gt": int((~gt_ignore).sum()),
        }

    # -- accumulate --------------------------------------------------------
    def accumulate(self):
        p = self.params
        T = len(p.iou_thrs)
        R = len(p.rec_thrs)
        K = len(p.cat_ids)
        A = len(p.area_rng)
        M = len(p.max_dets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        for k, cat_id in enumerate(p.cat_ids):
            for a, area in enumerate(p.area_rng):
                per_img = [
                    self.eval_imgs.get((img_id, cat_id, tuple(area)))
                    for img_id in p.img_ids
                ]
                per_img = [e for e in per_img if e is not None]
                if not per_img:
                    continue
                for m, max_det in enumerate(p.max_dets):
                    dt_scores = np.concatenate([e["dt_scores"][:max_det] for e in per_img])
                    order = np.argsort(-dt_scores, kind="mergesort")
                    sorted_scores = dt_scores[order]
                    dtm = np.concatenate(
                        [e["dt_matches"][:, :max_det] for e in per_img], axis=1
                    )[:, order]
                    dti = np.concatenate(
                        [e["dt_ignore"][:, :max_det] for e in per_img], axis=1
                    )[:, order]
                    num_gt = sum(e["num_gt"] for e in per_img)
                    if num_gt == 0:
                        continue
                    tps = (dtm > 0) & ~dti
                    fps = (dtm == 0) & ~dti
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for t in range(T):
                        tp, fp = tp_sum[t], fp_sum[t]
                        nd = len(tp)
                        rc = tp / num_gt
                        pr = tp / (fp + tp + np.spacing(1))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        # precision envelope
                        q = np.zeros(R)
                        ss = np.zeros(R)
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, p.rec_thrs, side="left")
                        for ri, pi in enumerate(inds):
                            if pi < nd:
                                q[ri] = pr[pi]
                                ss[ri] = sorted_scores[pi]
                        precision[t, :, k, a, m] = q
                        scores[t, :, k, a, m] = ss
        self.eval = {
            "precision": precision,
            "recall": recall,
            "scores": scores,
            "params": p,
        }

    # -- summarize ---------------------------------------------------------
    def _summarize(self, ap=1, iou_thr=None, area="all", max_dets=100):
        p = self.params
        a = p.area_lbls.index(area)
        m = p.max_dets.index(max_dets)
        if ap:
            s = self.eval["precision"]
            if iou_thr is not None:
                t = np.where(np.isclose(p.iou_thrs, iou_thr))[0]
                s = s[t]
            s = s[:, :, :, a, m]
        else:
            s = self.eval["recall"]
            if iou_thr is not None:
                t = np.where(np.isclose(p.iou_thrs, iou_thr))[0]
                s = s[t]
            s = s[:, :, a, m]
        valid = s[s > -1]
        return np.mean(valid) if valid.size else -1.0

    def summarize(self):
        self.stats = np.array(
            [
                self._summarize(1),
                self._summarize(1, iou_thr=0.5),
                self._summarize(1, iou_thr=0.75),
                self._summarize(1, area="small"),
                self._summarize(1, area="medium"),
                self._summarize(1, area="large"),
                self._summarize(0, max_dets=1),
                self._summarize(0, max_dets=10),
                self._summarize(0, max_dets=100),
                self._summarize(0, area="small"),
                self._summarize(0, area="medium"),
                self._summarize(0, area="large"),
            ]
        )
        tmpl = " Average {:9} (AP) @[ IoU={:<9} | area={:>6} | maxDets={:>3} ] = {:0.3f}"
        lines = [
            tmpl.format("Precision", "0.50:0.95", "all", 100, self.stats[0]),
            tmpl.format("Precision", "0.50", "all", 100, self.stats[1]),
            tmpl.format("Precision", "0.75", "all", 100, self.stats[2]),
            tmpl.format("Precision", "0.50:0.95", "small", 100, self.stats[3]),
            tmpl.format("Precision", "0.50:0.95", "medium", 100, self.stats[4]),
            tmpl.format("Precision", "0.50:0.95", "large", 100, self.stats[5]),
            tmpl.format("Recall", "0.50:0.95", "all", 1, self.stats[6]),
            tmpl.format("Recall", "0.50:0.95", "all", 10, self.stats[7]),
            tmpl.format("Recall", "0.50:0.95", "all", 100, self.stats[8]),
            tmpl.format("Recall", "0.50:0.95", "small", 100, self.stats[9]),
            tmpl.format("Recall", "0.50:0.95", "medium", 100, self.stats[10]),
            tmpl.format("Recall", "0.50:0.95", "large", 100, self.stats[11]),
        ]
        print("\n".join(lines))


class _Params:
    def __init__(self):
        self.img_ids = []
        self.cat_ids = []
        self.iou_thrs = np.linspace(0.5, 0.95, 10)
        self.rec_thrs = np.linspace(0.0, 1.0, 101)
        self.max_dets = [1, 10, 100]
        self.area_rng = [
            [0, 1e10],
            [0, 32**2],
            [32**2, 96**2],
            [96**2, 1e10],
        ]
        self.area_lbls = ["all", "small", "medium", "large"]

    # pycocotools-compat aliases used by metrics code
    @property
    def iouThrs(self):
        return self.iou_thrs
