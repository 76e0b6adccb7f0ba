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
    """Integrated AP (protocol of metrics/imgnetvid.py:40-66): precision
    envelope via a reversed running max, integrated over recall steps."""
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
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


def _pair_iou(a, b):
    """Elementwise +1-convention IoU over aligned (N, 4) box arrays;
    vectorised form of the reference's per-pair boxoverlap
    (imgnetvid.py:288-310)."""
    iw = np.minimum(a[:, 2], b[:, 2]) - np.maximum(a[:, 0], b[:, 0]) + 1
    ih = np.minimum(a[:, 3], b[:, 3]) - np.maximum(a[:, 1], b[:, 1]) + 1
    inter = np.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    out = np.zeros(len(a))
    # inter > 0 implies both boxes are non-degenerate, so the union is >= 1
    np.divide(inter, area_a + area_b - inter, out=out, where=inter > 0)
    return out


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

    if not recs:  # no evaluated images at all (reference: empty cells -> -1)
        return np.full(
            (len(motion_ranges), len(area_ranges), len(classname_map)), -1.0
        )

    motion_iou = dataset.motion_ious
    n_img = len(recs)
    n_cls = len(classname_map) if class_map is None else max(class_map) + 1

    # ---- flat gt arrays, recs order (python touches lists-of-arrays only;
    # all per-element work is vectorised)
    gt_boxes_l = [rec["bbox"] for rec in recs]
    gt_thr_l = [rec["thr"] for rec in recs]
    gt_label_l = [rec["label"] for rec in recs]
    if class_map is not None:
        cm = np.asarray(class_map)
        mapped = [cm[np.asarray(l, int).ravel()] for l in gt_label_l]
        keeps = [m >= 0 for m in mapped]
        gt_boxes_l = [b[k] for b, k in zip(gt_boxes_l, keeps)]
        gt_thr_l = [t[k] for t, k in zip(gt_thr_l, keeps)]
        gt_label_l = [m[k] for m, k in zip(mapped, keeps)]
    ng_per_img = np.array([len(l) for l in gt_label_l], int)
    n_gt = int(ng_per_img.sum())
    gt_boxes = np.concatenate(gt_boxes_l) if n_gt else np.zeros((0, 4))
    gt_thr = np.concatenate(gt_thr_l) if n_gt else np.zeros(0)
    gt_label = (
        np.concatenate(gt_label_l).astype(int) if n_gt else np.zeros(0, int)
    )
    if agnostic:
        gt_label = gt_label * 0
    gt_area = (
        (gt_boxes[:, 3] - gt_boxes[:, 1] + 1) * (gt_boxes[:, 2] - gt_boxes[:, 0] + 1)
        if n_gt
        else np.zeros(0)
    )
    gstart = np.concatenate([[0], np.cumsum(ng_per_img)[:-1]]).astype(int)
    npos_bak = np.bincount(gt_label, minlength=n_cls).astype(float)

    raw_motion_l = [
        np.asarray(motion_iou[str(rec["img_ids"])], float).ravel() for rec in recs
    ]
    raw_len = np.array([len(r) for r in raw_motion_l], int)
    raw_motion_flat = np.concatenate(raw_motion_l) if raw_len.sum() else np.zeros(0)
    raw_slot = np.repeat(np.arange(n_img), raw_len)
    # the reference indexes the raw per-image motion array with the
    # *filtered* gt index (imgnetvid.py:233-236); keep that contract
    gt_motion = (
        np.concatenate([r[:ng] for r, ng in zip(raw_motion_l, ng_per_img)])
        if n_gt
        else np.zeros(0)
    )

    # ---- flat det arrays sorted image-major, confidence-descending within
    # the image (dets for images outside the eval set are dropped, as the
    # reference's per-image cells do implicitly)
    rec_ids = np.array([int(rec["img_ids"]) for rec in recs])
    rid_order = np.argsort(rec_ids)
    rid_sorted = rec_ids[rid_order]
    pos = np.searchsorted(rid_sorted, img_ids) if len(img_ids) else np.zeros(0, int)
    pos = np.clip(pos, 0, len(rid_sorted) - 1)
    hit = rid_sorted[pos] == img_ids if len(img_ids) else np.zeros(0, bool)
    det_slot_all = np.where(hit, rid_order[pos], -1)
    keep = det_slot_all >= 0
    order = (
        np.lexsort((-obj_confs[keep], det_slot_all[keep])) if keep.any() else np.zeros(0, int)
    )
    det_slot = det_slot_all[keep][order]
    det_label = obj_labels[keep][order].astype(int)
    det_conf = obj_confs[keep][order]
    det_bbox = obj_bboxes[keep][order]
    n_det = len(det_slot)
    det_area = (
        (det_bbox[:, 3] - det_bbox[:, 1] + 1) * (det_bbox[:, 2] - det_bbox[:, 0] + 1)
        if n_det
        else np.zeros(0)
    )
    det_ngt = ng_per_img[det_slot] if n_det else np.zeros(0, int)
    det_imgslot = det_slot

    # ---- (det, gt) pairs within each image, built by repetition
    ng_per_det = det_ngt
    pr_det = np.repeat(np.arange(n_det), ng_per_det)
    cum = np.concatenate([[0], np.cumsum(ng_per_det)]).astype(int)
    within = np.arange(len(pr_det)) - cum[pr_det]
    pr_gt = (gstart[det_slot[pr_det]] + within) if len(pr_det) else np.zeros(0, int)
    pr_ov = (
        _pair_iou(det_bbox[pr_det], gt_boxes[pr_gt]) if len(pr_det) else np.zeros(0)
    )

    # ---- greedy claim, once (the match is range-independent): walk the
    # eligible pairs in (det, ov desc, gt asc) order — dets are already in
    # confidence order within their image — claiming the first free gt;
    # identical to the reference's per-det scan with its strict-> tie rule
    elig = np.flatnonzero(
        (pr_ov >= gt_thr[pr_gt]) & (det_label[pr_det] == gt_label[pr_gt])
    ) if len(pr_det) else np.zeros(0, int)
    eorder = np.lexsort((pr_gt[elig], -pr_ov[elig], pr_det[elig]))
    det_match = np.full(n_det, -1)
    taken = bytearray(n_gt)
    dm = det_match.tolist()
    for d, g in zip(pr_det[elig][eorder].tolist(), pr_gt[elig][eorder].tolist()):
        if dm[d] < 0 and not taken[g]:
            dm[d] = g
            taken[g] = True
    det_match = np.asarray(dm, int) if n_det else det_match

    all_motion = raw_motion_flat
    matched = det_match >= 0
    unmatched = ~matched

    # range-independent AP machinery, computed once: global confidence
    # order and the per-class selections within it
    conf_order = np.argsort(-det_conf)
    lab_sorted = det_label[conf_order]
    cls_ids = (
        list(class_map)[: len(classname_map)]
        if class_map is not None
        else list(range(len(classname_map)))
    )
    cls_sel = [np.flatnonzero(lab_sorted == cid) for cid in cls_ids]

    ap = np.zeros((len(motion_ranges), len(area_ranges), len(classname_map)))
    for mi, (m_lo, m_hi) in enumerate(motion_ranges):
        in_range = (all_motion >= m_lo) & (all_motion <= m_hi)
        empty_weight = in_range.sum() / float(len(all_motion)) if len(all_motion) else 0.0
        gt_ig_motion = (gt_motion < m_lo) | (gt_motion > m_hi)
        # fractional-FP weight: ignored count over the RAW motion array,
        # normalised by the filtered gt count (reference :258-266 semantics)
        ig_raw_cnt = np.bincount(
            raw_slot,
            weights=((raw_motion_flat < m_lo) | (raw_motion_flat > m_hi)).astype(float),
            minlength=n_img,
        )
        frac = np.where(ng_per_img > 0, ig_raw_cnt / np.maximum(ng_per_img, 1), 0.0)
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
                tp, fp, conf_order, cls_sel, cls_ids, npos
            )
    return ap


def _calculate_ap(tp_all, fp_all, conf_order, cls_sel, cls_ids, npos):
    """Per-class AP from flat tp/fp arrays (protocol of imgnetvid.py:313-354).

    The confidence ordering and the per-class selections are identical for
    every (motion, area) range, so the caller precomputes them once
    (`conf_order`, `cls_sel`: per-class indices into the sorted order;
    `cls_ids`: the npos slot per class).  Zero detections with gts present
    yields AP 0 (empty cumsums), matching the reference."""
    tp_all, fp_all = tp_all[conf_order], fp_all[conf_order]
    cur_ap = np.zeros(len(cls_sel))
    for c, (sel, cid) in enumerate(zip(cls_sel, cls_ids)):
        if npos[cid] <= 0:
            cur_ap[c] = -1
            continue
        tp = np.cumsum(tp_all[sel])
        fp = np.cumsum(fp_all[sel])
        rec = tp / npos[cid]
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
