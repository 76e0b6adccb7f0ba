"""Pascal VOC mAP metrics.

Capability parity with `/root/reference/metrics/pascalvoc.py`:
  * `VOCMApMetric` (:12) — streaming per-class score/match buffers, greedy
    IoU matching with difficult handling, integrated AP, cross-dataset
    `class_map` remapping (:71-81,:126-127);
  * `VOC07MApMetric` (:523) — 11-point interpolated AP;
  * `VOCMApMetricTemporal` (:262) — a metric per temporal offset t.

Protocol: reset() / update(preds, gts) / get() -> (names, values), fed with
numpy arrays (post-NMS device outputs brought to host).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Optional, Sequence

import numpy as np

from ..ops.bbox import np_bbox_iou

__all__ = ["VOCMApMetric", "VOC07MApMetric", "VOCMApMetricTemporal"]


def _as_numpy(x):
    if isinstance(x, (list, tuple)):
        # keep per-image None (missing difficult flags) as None — asarray
        # would wrap it into a 0-d object array and defeat the `is None` check
        return [None if a is None else np.asarray(a) for a in x]
    return np.asarray(x)


class VOCMApMetric:
    """Mean AP for detection with VOC-style greedy matching."""

    def __init__(self, iou_thresh: float = 0.5, class_names: Optional[Sequence[str]] = None,
                 class_map: Optional[Sequence[int]] = None):
        self.iou_thresh = iou_thresh
        self.class_names = list(class_names) if class_names is not None else None
        self.class_map = class_map
        if self.class_names is None:
            self.name = "VOCMeanAP"
            self.num = None
        else:
            self.name = self.class_names + ["mAP"]
            self.num = len(self.class_names) + 1
        self.reset()

    def reset(self):
        if self.num is None:
            self.num_inst = 0
            self.sum_metric = 0.0
        else:
            self.num_inst = [0] * self.num
            self.sum_metric = [0.0] * self.num
        self._n_pos = defaultdict(int)
        self._score = defaultdict(list)
        self._match = defaultdict(list)

    def get(self):
        self._update()
        if self.num is None:
            if self.num_inst == 0:
                return (self.name, float("nan"))
            return (self.name, self.sum_metric / self.num_inst)
        names = [str(self.name[i]) for i in range(self.num)]
        values = [
            x / y if y != 0 else float("nan")
            for x, y in zip(self.sum_metric, self.num_inst)
        ]
        if self.class_map:
            values = []
            for i in range(self.num):
                if i == self.num - 1:  # mAP row
                    values.append(
                        self.sum_metric[i] / self.num_inst[i] if self.num_inst[i] else float("nan")
                    )
                elif self.class_map[i] < 0:
                    values.append(float("nan"))
                else:
                    j = self.class_map[i]
                    values.append(
                        self.sum_metric[j] / self.num_inst[j] if self.num_inst[j] else float("nan")
                    )
        return names, values

    def update(self, pred_bboxes, pred_labels, pred_scores,
               gt_bboxes, gt_labels, gt_difficults=None, **kwargs):
        """All args (B, N, ...) arrays or lists of per-image arrays; -1 rows
        are padding (reference pascalvoc.py:85-184)."""
        if gt_difficults is None:
            gt_difficults = [None] * len(_as_numpy(gt_labels))

        for pred_bbox, pred_label, pred_score, gt_bbox, gt_label, gt_difficult in zip(
            *[_as_numpy(x) for x in
              [pred_bboxes, pred_labels, pred_scores, gt_bboxes, gt_labels, gt_difficults]]
        ):
            valid_pred = np.where(pred_label.flat >= 0)[0]
            pred_bbox = pred_bbox[valid_pred, :]
            pred_label = pred_label.flat[valid_pred].astype(int)
            pred_score = pred_score.flat[valid_pred]

            if self.class_map is not None:
                gt_label = np.expand_dims(
                    np.array([self.class_map[int(l)] for l in gt_label.flat]), axis=0
                )
            valid_gt = np.where(gt_label.flat >= 0)[0]
            gt_bbox = gt_bbox[valid_gt, :]
            gt_label = gt_label.flat[valid_gt].astype(int)
            if gt_difficult is None:
                gt_difficult = np.zeros(gt_bbox.shape[0])
            else:
                gt_difficult = gt_difficult.flat[valid_gt]

            for l in np.unique(np.concatenate((pred_label, gt_label)).astype(int)):
                pred_mask_l = pred_label == l
                pred_bbox_l = pred_bbox[pred_mask_l]
                pred_score_l = pred_score[pred_mask_l]
                order = pred_score_l.argsort()[::-1]
                pred_bbox_l = pred_bbox_l[order]
                pred_score_l = pred_score_l[order]

                gt_mask_l = gt_label == l
                gt_bbox_l = gt_bbox[gt_mask_l]
                gt_difficult_l = gt_difficult[gt_mask_l]

                self._n_pos[l] += np.logical_not(gt_difficult_l).sum()
                self._score[l].extend(pred_score_l)

                if len(pred_bbox_l) == 0:
                    continue
                if len(gt_bbox_l) == 0:
                    self._match[l].extend((0,) * pred_bbox_l.shape[0])
                    continue

                iou = np_bbox_iou(pred_bbox_l, gt_bbox_l)
                gt_index = iou.argmax(axis=1)
                gt_index[iou.max(axis=1) < self.iou_thresh] = -1

                selec = np.zeros(gt_bbox_l.shape[0], dtype=bool)
                for gt_idx in gt_index:
                    if gt_idx >= 0:
                        if gt_difficult_l[gt_idx]:
                            self._match[l].append(-1)
                        else:
                            self._match[l].append(1 if not selec[gt_idx] else 0)
                        selec[gt_idx] = True
                    else:
                        self._match[l].append(0)

    def _update(self):
        aps = []
        recall, precs = self._recall_prec()
        for l, rec, prec in zip(range(len(precs)), recall, precs):
            ap = self._average_precision(rec, prec)
            aps.append(ap)
            if self.num is not None and l < (self.num - 1):
                self.sum_metric[l] = ap
                self.num_inst[l] = 1
        if self.num is None:
            self.num_inst = 1
            self.sum_metric = np.nanmean(aps) if aps else float("nan")
        else:
            self.num_inst[-1] = 1
            self.sum_metric[-1] = np.nanmean(aps) if aps else float("nan")

    def _recall_prec(self):
        n_fg_class = max(self._n_pos.keys(), default=-1) + 1
        prec = [None] * n_fg_class
        rec = [None] * n_fg_class
        for l in self._n_pos.keys():
            score_l = np.array(self._score[l])
            match_l = np.array(self._match[l], dtype=np.int32)
            order = score_l.argsort()[::-1]
            match_l = match_l[order]
            tp = np.cumsum(match_l == 1)
            fp = np.cumsum(match_l == 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                prec[l] = tp / (fp + tp)
            if self._n_pos[l] > 0:
                rec[l] = tp / self._n_pos[l]
        return rec, prec

    def _average_precision(self, rec, prec):
        """Integrated AP (area under interpolated PR curve)."""
        if rec is None or prec is None:
            return np.nan
        mrec = np.concatenate(([0.0], rec, [1.0]))
        mpre = np.concatenate(([0.0], np.nan_to_num(prec), [0.0]))
        for i in range(mpre.size - 1, 0, -1):
            mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
        i = np.where(mrec[1:] != mrec[:-1])[0]
        return np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1])


class VOC07MApMetric(VOCMApMetric):
    """11-point interpolated AP (reference pascalvoc.py:523-560)."""

    def _average_precision(self, rec, prec):
        if rec is None or prec is None:
            return np.nan
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            if np.sum(rec >= t) == 0:
                p = 0
            else:
                p = np.max(np.nan_to_num(prec)[rec >= t])
            ap += p / 11.0
        return ap


class VOCMApMetricTemporal:
    """Per-temporal-offset VOC mAP: maintains one VOCMApMetric per timestep t
    (reference pascalvoc.py:262-520).  update() takes an extra leading list
    over the window's timesteps."""

    def __init__(self, t: int, iou_thresh: float = 0.5, class_names=None, class_map=None):
        self._t = t
        self._metrics = [
            VOCMApMetric(iou_thresh=iou_thresh, class_names=class_names, class_map=class_map)
            for _ in range(t)
        ]

    def reset(self):
        for m in self._metrics:
            m.reset()

    def update_t(self, t_idx: int, *args, **kwargs):
        self._metrics[t_idx].update(*args, **kwargs)

    def update(self, pred_bboxes, pred_labels, pred_scores, gt_bboxes, gt_labels,
               gt_difficults=None):
        """Each arg is a length-t list of per-timestep batch arrays."""
        for ti in range(self._t):
            self._metrics[ti].update(
                pred_bboxes[ti], pred_labels[ti], pred_scores[ti],
                gt_bboxes[ti], gt_labels[ti],
                None if gt_difficults is None else gt_difficults[ti],
            )

    def get(self):
        names, values = [], []
        for ti, m in enumerate(self._metrics):
            n, v = m.get()
            if isinstance(n, list):
                names += [f"t{ti}:{x}" for x in n]
                values += v
            else:
                names.append(f"t{ti}:{n}")
                values.append(v)
        return names, values
