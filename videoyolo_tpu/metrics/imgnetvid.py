"""ImageNet-VID motion-aware mAP (FGFA protocol).

Capability parity with `/root/reference/metrics/imgnetvid.py`:
  * `parse_set` (:9) — per-frame gt records with small-object pixel-tolerance
    IoU thresholds thr = wh/((w+tol)(h+tol)) capped at iou_thr (:28-34);
  * `vid_eval_motion` (:68) — AP over motion ranges x area ranges with
    motion/area ignore masks and fractional FP weighting for out-of-range
    matches (:258-266);
  * `VIDDetectionMetric` (:357) — streaming buffer keyed by sample id,
    motion ranges [0-1], [0-.7], [.7-.9], [.9-1] and area ranges
    all / <50^2 / 50^2-150^2 / >150^2 (:382-383).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

__all__ = ["VIDDetectionMetric", "vid_eval_motion", "vid_ap", "parse_set"]


def _overlap(bb, bbgt):
    """+1-convention IoU (imgnetvid metric boxoverlap :288-310)."""
    iw = min(bb[2], bbgt[2]) - max(bb[0], bbgt[0]) + 1
    ih = min(bb[3], bbgt[3]) - max(bb[1], bbgt[1]) + 1
    if iw > 0 and ih > 0:
        inter = iw * ih
        ua = (
            (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
            + (bbgt[2] - bbgt[0] + 1.0) * (bbgt[3] - bbgt[1] + 1.0)
            - inter
        )
        return inter / ua
    return 0.0


def vid_ap(rec, prec):
    """Integrated AP (metrics/imgnetvid.py:40-66)."""
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1])


def parse_set(dataset, iou_thr=0.5, pixel_tolerance=10, offset=None):
    """Per-frame gt records with tolerance thresholds (imgnetvid.py:9-37)."""
    res = []
    ids = dataset.get_sample_ids()
    if isinstance(ids[0], list):
        ids = [w[offset + 2] for w in ids]
    for sid in ids:
        boxes = dataset.get_label(sid)
        w = boxes[:, 2] - boxes[:, 0] + 1
        h = boxes[:, 3] - boxes[:, 1] + 1
        thr = (w * h) / ((w + pixel_tolerance) * (h + pixel_tolerance))
        thr[thr > iou_thr] = iou_thr
        res.append(
            {
                "bbox": boxes[:, :4],
                "label": boxes[:, 4].astype(int),
                "thr": thr,
                "img_ids": sid,
            }
        )
    return res


def _pairwise_overlap(det_boxes, gt_boxes):
    """+1-convention IoU matrix (num_det, num_gt); vectorised form of the
    reference's per-pair boxoverlap (imgnetvid.py:288-310)."""
    if len(det_boxes) == 0 or len(gt_boxes) == 0:
        return np.zeros((len(det_boxes), len(gt_boxes)))
    d = det_boxes[:, None, :]
    g = gt_boxes[None, :, :]
    iw = np.minimum(d[..., 2], g[..., 2]) - np.maximum(d[..., 0], g[..., 0]) + 1
    ih = np.minimum(d[..., 3], g[..., 3]) - np.maximum(d[..., 1], g[..., 1]) + 1
    inter = np.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    area_d = (d[..., 2] - d[..., 0] + 1.0) * (d[..., 3] - d[..., 1] + 1.0)
    area_g = (g[..., 2] - g[..., 0] + 1.0) * (g[..., 3] - g[..., 1] + 1.0)
    return np.where(inter > 0, inter / (area_d + area_g - inter), 0.0)


def vid_eval_motion(
    dataset,
    dt,
    motion_ranges,
    area_ranges,
    iou_threshold=0.5,
    class_map=None,
    agnostic=False,
    offset=None,
):
    """Motion-conditioned AP table (# motion, # area, # classes), protocol
    parity with the FGFA eval (`/root/reference/metrics/imgnetvid.py:68-286`).

    Re-engineered around one observation: the greedy det->gt matching does
    not depend on the motion/area range at all (eligibility is IoU >= the
    per-gt tolerance threshold + class match + availability), so it runs
    ONCE per image instead of once per (motion, area) combination, and every
    per-range pass is pure array arithmetic over flat det/gt/pair arrays —
    no per-detection Python loops.  At val17 scale (~176k frames x 16 range
    combos) this is the same vectorisation step the VOC matcher got
    (metrics/pascalvoc.py); a differential test against a sequential oracle
    locks the protocol (tests/test_vid.py)."""
    classname_map = dataset.wn_classes
    gt_img_ids = dataset.get_sample_ids()
    if isinstance(gt_img_ids[0], list):
        gt_img_ids = [w[offset + 2] for w in gt_img_ids]
    if agnostic:
        classname_map = ["agnostic"]

    recs = parse_set(dataset, iou_thr=iou_threshold, pixel_tolerance=10, offset=offset)

    dt = np.array(dt, dtype=object)
    img_ids = np.array([int(r[0]) for r in dt])
    obj_labels = np.array([int(r[1]) for r in dt])
    obj_confs = np.array([float(r[2]) for r in dt])
    obj_bboxes = np.array(
        [list(map(float, r[3:7] if len(r) > 4 else r[3])) for r in dt]
    ).reshape(len(dt), 4) if len(dt) else np.zeros((0, 4))
    if agnostic:
        obj_labels = obj_labels * 0

    # detections grouped per image, confidence-descending within the image
    by_img = {}
    if len(img_ids):
        order = np.lexsort((-obj_confs, img_ids))
        img_sorted = img_ids[order]
        starts = np.flatnonzero(np.r_[True, img_sorted[1:] != img_sorted[:-1]])
        for s, e in zip(starts, np.r_[starts[1:], len(img_sorted)]):
            by_img[int(img_sorted[s])] = order[s:e]

    motion_iou = dataset.motion_ious

    # ---- one pass over images: filter gts, match greedily, emit flat arrays
    n_cls = len(classname_map) if class_map is None else max(class_map) + 1
    npos_bak = np.zeros(n_cls)
    det_label_g, det_conf_g, det_area_g = [], [], []  # per image, recs order
    det_match_g = []  # global gt index or -1
    det_ngt_g, det_imgslot_g = [], []
    gt_label_g, gt_area_g, gt_motion_g = [], [], []
    pr_det_g, pr_gt_g, pr_ov_g = [], [], []  # flat (det, gt) pairs
    img_ig_raw = []  # per image: raw motion array (for frac weights)
    n_det = n_gt = 0
    for slot, rec in enumerate(recs):
        img_id = rec["img_ids"]
        gt_bboxes, gt_thr, gt_labels = rec["bbox"], rec["thr"], rec["label"]
        if class_map is not None:
            gt_labels = np.array([class_map[int(l)] for l in gt_labels.flat])
            valid = np.where(gt_labels.flat >= 0)[0]
            gt_bboxes = gt_bboxes[valid, :]
            gt_thr = gt_thr[valid]
            gt_labels = gt_labels.flat[valid].astype(int)
        if agnostic:
            gt_labels = gt_labels * 0
        np.add.at(npos_bak, gt_labels, 1)
        ng = len(gt_labels)
        raw_motion = np.asarray(motion_iou[str(img_id)], dtype=float)
        img_ig_raw.append(raw_motion)

        didx = by_img.get(int(img_id), np.zeros(0, int))
        nd = len(didx)
        ov = _pairwise_overlap(obj_bboxes[didx], gt_bboxes)
        # greedy claim: confidence order, best still-free gt above its
        # tolerance threshold (first index on ties, like the scan's strict >)
        elig = (ov >= gt_thr[None, :]) & (obj_labels[didx][:, None] == gt_labels[None, :])
        match = np.full(nd, -1)
        taken = np.zeros(ng, bool)
        for j in range(nd):
            cand = elig[j] & ~taken
            if cand.any():
                k = int(np.argmax(np.where(cand, ov[j], -1.0)))
                match[j] = n_gt + k
                taken[k] = True

        b = obj_bboxes[didx]
        det_label_g.append(obj_labels[didx])
        det_conf_g.append(obj_confs[didx])
        det_area_g.append((b[:, 3] - b[:, 1] + 1) * (b[:, 2] - b[:, 0] + 1) if nd else np.zeros(0))
        det_match_g.append(match)
        det_ngt_g.append(np.full(nd, ng))
        det_imgslot_g.append(np.full(nd, slot))
        gt_label_g.append(gt_labels)
        gb = gt_bboxes
        gt_area_g.append((gb[:, 3] - gb[:, 1] + 1) * (gb[:, 2] - gb[:, 0] + 1) if ng else np.zeros(0))
        # the reference indexes the raw per-image motion array with the
        # *filtered* gt index (imgnetvid.py:233-236); keep that contract
        gt_motion_g.append(raw_motion[:ng])
        if nd and ng:
            dj, gk = np.meshgrid(np.arange(nd), np.arange(ng), indexing="ij")
            pr_det_g.append(n_det + dj.ravel())
            pr_gt_g.append(n_gt + gk.ravel())
            pr_ov_g.append(ov.ravel())
        n_det += nd
        n_gt += ng

    cat = lambda parts, dt_=float: (
        np.concatenate(parts) if parts else np.zeros(0, dt_)
    )
    det_label = cat(det_label_g, int).astype(int)
    det_conf = cat(det_conf_g)
    det_area = cat(det_area_g)
    det_match = cat(det_match_g, int).astype(int)
    det_ngt = cat(det_ngt_g, int).astype(int)
    det_imgslot = cat(det_imgslot_g, int).astype(int)
    gt_label = cat(gt_label_g, int).astype(int)
    gt_area = cat(gt_area_g)
    gt_motion = cat(gt_motion_g)
    pr_det = cat(pr_det_g, int).astype(int)
    pr_gt = cat(pr_gt_g, int).astype(int)
    pr_ov = cat(pr_ov_g)

    if not recs:  # no evaluated images at all (reference: empty cells -> -1)
        return np.full(
            (len(motion_ranges), len(area_ranges), len(classname_map)), -1.0
        )

    all_motion = (
        np.concatenate([np.asarray(motion_iou[str(k)], float) for k in gt_img_ids])
        if gt_img_ids
        else np.zeros(0)
    )
    matched = det_match >= 0
    unmatched = ~matched

    ap = np.zeros((len(motion_ranges), len(area_ranges), len(classname_map)))
    for mi, (m_lo, m_hi) in enumerate(motion_ranges):
        in_range = (all_motion >= m_lo) & (all_motion <= m_hi)
        empty_weight = in_range.sum() / float(len(all_motion)) if len(all_motion) else 0.0
        gt_ig_motion = (gt_motion < m_lo) | (gt_motion > m_hi)
        # fractional-FP weight: ignored count over the RAW motion array,
        # normalised by the filtered gt count (reference :258-266 semantics)
        frac = np.array(
            [
                ((raw < m_lo) | (raw > m_hi)).sum() / float(ng) if ng else 0.0
                for raw, ng in zip(img_ig_raw, [len(g) for g in gt_motion_g])
            ]
        ) if img_ig_raw else np.zeros(0)
        # per-det best overlap against motion-ignored / non-ignored gts
        ovmax_ig = np.full(n_det, -1.0)
        ovmax_nig = np.full(n_det, -1.0)
        if len(pr_det):
            ig_pair = gt_ig_motion[pr_gt]
            np.maximum.at(ovmax_ig, pr_det[ig_pair], pr_ov[ig_pair])
            np.maximum.at(ovmax_nig, pr_det[~ig_pair], pr_ov[~ig_pair])

        for ai, (a_lo, a_hi) in enumerate(area_ranges):
            gt_ig_area = (gt_area < a_lo) | (gt_area > a_hi)
            tp = np.zeros(n_det)
            fp = np.zeros(n_det)
            m = det_match[matched]
            tp[matched] = (~gt_ig_motion[m] & ~gt_ig_area[m]).astype(float)
            if unmatched.any():
                nig, ig = ovmax_nig[unmatched], ovmax_ig[unmatched]
                base = (nig > ig).astype(float)
                eq = nig == ig
                base[eq] = np.where(
                    det_ngt[unmatched][eq] == 0,
                    empty_weight,
                    frac[det_imgslot[unmatched]][eq] if len(frac) else 0.0,
                )
                area_ok = (det_area[unmatched] >= a_lo) & (det_area[unmatched] <= a_hi)
                fp[unmatched] = np.where(area_ok, base, 0.0)

            npos = npos_bak.copy()
            ig_any = gt_ig_motion | gt_ig_area
            np.subtract.at(npos, gt_label[ig_any], 1)
            ap[mi][ai] = _calculate_ap(
                tp, fp, det_label, det_conf, classname_map, npos, class_map
            )
    return ap


def _calculate_ap(tp_all, fp_all, obj_labels, confs, classname_map, npos,
                  class_map=None):
    """Per-class AP from flat tp/fp arrays (protocol of imgnetvid.py:313-354,
    fed directly from the vectorised per-range pass).  Zero detections with
    gts present yields AP 0 (empty cumsums), matching the reference."""
    order = np.argsort(-confs)
    tp_all, fp_all, obj_labels = tp_all[order], fp_all[order], obj_labels[order]
    if class_map is None:
        class_map = list(range(len(classname_map)))
    cur_ap = np.zeros(len(classname_map))
    for c in range(len(classname_map)):
        fp = np.cumsum(fp_all[obj_labels == class_map[c]])
        tp = np.cumsum(tp_all[obj_labels == class_map[c]])
        if npos[class_map[c]] <= 0:
            cur_ap[c] = -1
        else:
            rec = tp / npos[class_map[c]]
            prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
            cur_ap[c] = vid_ap(rec, prec)
    return cur_ap


class VIDDetectionMetric:
    """Streaming VID motion metric (metrics/imgnetvid.py:357-472)."""

    def __init__(self, dataset, conf_score_thresh=0.05, iou_thresh=0.5,
                 class_map=None, agnostic=False, offset=None):
        self.name = "ImgNetVIDMeanAP"
        self.dataset = dataset
        self._results: List[list] = []
        self._conf_score_thresh = conf_score_thresh
        self._iou_thresh = iou_thresh
        self._class_map = class_map
        self._agnostic = agnostic
        self._offset = offset
        self._motion_ranges = [[0.0, 1.0], [0.0, 0.7], [0.7, 0.9], [0.9, 1.0]]
        self._area_ranges = [
            [0, 1e5 * 1e5],
            [0, 50 * 50],
            [50 * 50, 150 * 150],
            [150 * 150, 1e5 * 1e5],
        ]

    def reset(self):
        self._results = []

    def get(self):
        if not self._results:
            return ["mAP"], ["0.0"]
        ap = vid_eval_motion(
            self.dataset, self._results, self._motion_ranges, self._area_ranges,
            iou_threshold=self._iou_thresh, class_map=self._class_map,
            agnostic=self._agnostic, offset=self._offset,
        )
        names, values = ["~~~~ Summary metrics ~~~~\n"], []
        info = ""
        for mi, mr in enumerate(self._motion_ranges):
            for ai, ar in enumerate(self._area_ranges):
                valid = [a for a in ap[mi][ai] if a >= 0]
                info += (
                    f"motion [{mr[0]:.1f} {mr[1]:.1f}], "
                    f"area [{np.sqrt(ar[0]):.0f} {np.sqrt(ar[1]):.0f}]\n"
                    f"Mean AP@{self._iou_thresh:.1f} = "
                    f"{np.mean(valid) if valid else float('nan'):.4f}\n\n"
                )
        values.append(info)
        if self._agnostic:
            names.append("agnostic")
            values.append("{:.1f}".format(100 * ap[0, 0, 0]))
            return names, values
        for cls_ind, cls_name in enumerate(self.dataset.classes):
            names.append(cls_name)
            values.append("{:.1f}".format(100 * ap[0, 0, cls_ind]))
        return names, values

    def update(self, pred_bboxes, pred_labels, pred_scores, gt_bboxes=None,
               gt_ids=None, gt_difficults=None, sid=None, **kwargs):
        for pred_bbox, pred_label, pred_score in zip(
            *[np.asarray(x) for x in [pred_bboxes, pred_labels, pred_scores]]
        ):
            valid = np.where(pred_label.flat >= 0)[0]
            pred_bbox = pred_bbox[valid, :].astype(float)
            pred_label = pred_label.flat[valid].astype(int)
            pred_score = pred_score.flat[valid].astype(float)
            for bbox, label, score in zip(pred_bbox, pred_label, pred_score):
                if score < self._conf_score_thresh:
                    continue
                self._results.append([sid, int(label), float(score)] + bbox[:4].tolist())
