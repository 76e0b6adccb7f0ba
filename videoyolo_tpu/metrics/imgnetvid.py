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

import copy
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
    """Motion-conditioned AP table (# motion, # area, # classes)
    (metrics/imgnetvid.py:68-286)."""
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
    obj_bboxes = np.array([list(map(float, r[3:7] if len(r) > 4 else r[3])) for r in dt])

    if obj_bboxes.shape[0] > 0:
        order = np.argsort(img_ids)
        img_ids, obj_labels = img_ids[order], obj_labels[order]
        obj_confs, obj_bboxes = obj_confs[order], obj_bboxes[order]

    num_imgs = max(max(gt_img_ids), img_ids.max() if len(img_ids) else 0) + 1
    obj_labels_cell = [None] * num_imgs
    obj_confs_cell = [None] * num_imgs
    obj_bboxes_cell = [None] * num_imgs
    # group detections per image, sorted by confidence desc
    start_i = 0
    if len(img_ids):
        img_id = img_ids[0]
        for i in range(len(img_ids)):
            if i == len(img_ids) - 1 or img_ids[i + 1] != img_id:
                conf = obj_confs[start_i : i + 1]
                srt = np.argsort(-conf)
                obj_labels_cell[img_id] = obj_labels[start_i : i + 1][srt]
                obj_confs_cell[img_id] = conf[srt]
                obj_bboxes_cell[img_id] = obj_bboxes[start_i : i + 1][srt]
                if i < len(img_ids) - 1:
                    img_id = img_ids[i + 1]
                    start_i = i + 1
    if agnostic:
        obj_labels_cell = [c * 0 if c is not None else None for c in obj_labels_cell]

    # precompute det/gt overlaps per image
    ov_all = [None] * num_imgs
    npos = np.zeros(len(classname_map) if class_map is None else max(class_map) + 1)
    for rec in recs:
        img_id = rec["img_ids"]
        gt_bboxes, gt_labels = rec["bbox"], rec["label"]
        if class_map is not None:
            gt_labels = np.array([class_map[int(l)] for l in gt_labels.flat])
            valid = np.where(gt_labels.flat >= 0)[0]
            gt_bboxes = gt_bboxes[valid, :]
            gt_labels = gt_labels.flat[valid].astype(int)
        if agnostic:
            gt_labels = gt_labels * 0
        for x in gt_labels:
            npos[x] += 1
        labels = obj_labels_cell[img_id]
        bboxes = obj_bboxes_cell[img_id]
        num_obj = 0 if labels is None else len(labels)
        ov_obj = [None] * num_obj
        for j in range(num_obj):
            ov_obj[j] = np.array(
                [_overlap(bboxes[j], gt_bboxes[k]) for k in range(len(gt_labels))]
            )
        ov_all[img_id] = ov_obj

    motion_iou = dataset.motion_ious
    ap = np.zeros((len(motion_ranges), len(area_ranges), len(classname_map)))
    npos_bak = copy.deepcopy(npos)

    for mi, motion_range in enumerate(motion_ranges):
        for ai, area_range in enumerate(area_ranges):
            tp_cell = [None] * num_imgs
            fp_cell = [None] * num_imgs
            all_motion = np.concatenate([motion_iou[str(k)] for k in gt_img_ids])
            in_range = (all_motion >= motion_range[0]) & (all_motion <= motion_range[1])
            empty_weight = in_range.sum() / float(len(all_motion)) if len(all_motion) else 0.0

            for rec in recs:
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
                num_gt_obj = len(gt_labels)
                gt_detected = np.zeros(num_gt_obj)

                gt_motion = motion_iou[str(img_id)]
                ig_motion = [
                    (gt_motion[i] < motion_range[0]) | (gt_motion[i] > motion_range[1])
                    for i in range(len(gt_motion))
                ]
                gt_area = [(x[3] - x[1] + 1) * (x[2] - x[0] + 1) for x in gt_bboxes]
                ig_area = [(a < area_range[0]) | (a > area_range[1]) for a in gt_area]

                labels = obj_labels_cell[img_id]
                bboxes = obj_bboxes_cell[img_id]
                num_obj = 0 if labels is None else len(labels)
                tp = np.zeros(num_obj)
                fp = np.zeros(num_obj)
                for j in range(num_obj):
                    bb = bboxes[j]
                    ovmax = kmax = -1
                    ovmax_ig = ovmax_nig = -1
                    for k in range(num_gt_obj):
                        ov = ov_all[img_id][j][k]
                        if (
                            (ov >= gt_thr[k])
                            and (ov > ovmax)
                            and (not gt_detected[k])
                            and (labels[j] == gt_labels[k])
                        ):
                            ovmax, kmax = ov, k
                        if ig_motion[k] and ov > ovmax_ig:
                            ovmax_ig = ov
                        if (not ig_motion[k]) and ov > ovmax_nig:
                            ovmax_nig = ov
                    if kmax >= 0:
                        gt_detected[kmax] = 1
                        if (not ig_motion[kmax]) and (not ig_area[kmax]):
                            tp[j] = 1.0
                    else:
                        bb_area = (bb[3] - bb[1] + 1) * (bb[2] - bb[0] + 1)
                        if (bb_area < area_range[0]) | (bb_area > area_range[1]):
                            fp[j] = 0
                            continue
                        if ovmax_nig > ovmax_ig:
                            fp[j] = 1
                        elif ovmax_ig > ovmax_nig:
                            fp[j] = 0
                        elif num_gt_obj == 0:
                            fp[j] = empty_weight
                        else:
                            fp[j] = sum(1 for x in ig_motion if x) / float(num_gt_obj)
                tp_cell[img_id] = tp
                fp_cell[img_id] = fp
                for k in range(num_gt_obj):
                    label = 0 if agnostic else gt_labels[k]
                    if ig_motion[k] or ig_area[k]:
                        npos[label] -= 1

            ap[mi][ai] = _calculate_ap(
                tp_cell, fp_cell, gt_img_ids, obj_labels_cell, obj_confs_cell,
                classname_map, npos, class_map,
            )
            npos = copy.deepcopy(npos_bak)
    return ap


def _calculate_ap(tp_cell, fp_cell, gt_img_ids, obj_labels_cell, obj_confs_cell,
                  classname_map, npos, class_map=None):
    """Per-class AP from per-image tp/fp cells (imgnetvid.py:313-354)."""
    cells = [
        (tp_cell[i], fp_cell[i], obj_labels_cell[i], obj_confs_cell[i])
        for i in gt_img_ids
        if tp_cell[i] is not None
    ]
    if not cells:
        return np.full(len(classname_map), -1.0)
    tp_all = np.concatenate([c[0] for c in cells])
    fp_all = np.concatenate([c[1] for c in cells])
    obj_labels = np.concatenate([c[2] for c in cells])
    confs = np.concatenate([c[3] for c in cells])
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
