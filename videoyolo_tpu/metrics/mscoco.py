"""COCO detection metric.

Capability parity with `/root/reference/metrics/mscoco.py`
(`COCODetectionMetric` :17): buffers detections -> results json -> COCOeval
(:100-115), data_shape rescaling (:199-204), per-class AP breakdown at
IoU .5:.95 (:120-160), on-the-fly gt coco-json for non-COCO datasets
(:102-105).  Uses pycocotools when importable, else the self-contained numpy
CocoEval (data/cocojson.py).
"""
from __future__ import annotations

import io
import json
import os
import sys
import warnings
from typing import Optional

import numpy as np

__all__ = ["COCODetectionMetric"]


def _get_eval_backend(gt_index_or_path, results_path):
    """Returns (coco_eval, iou_thrs) using pycocotools if present."""
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval

        gt = gt_index_or_path if isinstance(gt_index_or_path, str) else None
        coco_gt = COCO(gt) if gt else gt_index_or_path
        pred = coco_gt.loadRes(results_path)
        coco_eval = COCOeval(coco_gt, pred, "bbox")
        return coco_eval
    except ImportError:
        from ..data.cocojson import CocoEval, CocoIndex

        coco_gt = (
            CocoIndex(gt_index_or_path)
            if isinstance(gt_index_or_path, str)
            else gt_index_or_path
        )
        pred = coco_gt.load_results(results_path)
        return CocoEval(coco_gt, pred, "bbox")


class COCODetectionMetric:
    """Streaming COCO bbox mAP (reference mscoco.py:17-225)."""

    def __init__(
        self,
        dataset,
        save_prefix: str,
        use_time: bool = True,
        cleanup: bool = False,
        score_thresh: float = 0.05,
        data_shape=None,
    ):
        self.name = "COCOMeanAP"
        self.dataset = dataset
        self._img_ids = sorted(dataset.sample_ids)
        self._current_id = 0
        self._cleanup = cleanup
        self._results = []
        self._score_thresh = score_thresh
        if isinstance(data_shape, (tuple, list)):
            assert len(data_shape) == 2, "Data shape must be (height, width)"
        elif data_shape:
            raise ValueError("data_shape must be None or tuple (height, width)")
        else:
            data_shape = None
        self._data_shape = data_shape
        if use_time:
            import datetime

            t = datetime.datetime.now().strftime("_%Y_%m_%d_%H_%M_%S")
        else:
            t = ""
        self._filename = os.path.abspath(os.path.expanduser(save_prefix) + t + ".json")
        os.makedirs(os.path.dirname(self._filename) or ".", exist_ok=True)
        open(self._filename, "w").close()

    def __del__(self):
        if self._cleanup:
            try:
                os.remove(self._filename)
            except OSError as err:
                warnings.warn(str(err))

    def reset(self):
        self._current_id = 0
        self._results = []

    def _update(self):
        if self._current_id != len(self._img_ids):
            warnings.warn(
                f"Recorded {self._current_id} out of {len(self._img_ids)} "
                "validation images, incomplete results"
            )
        if not self._results:
            self._results.append(
                {"image_id": self._img_ids[0], "category_id": 0, "bbox": [0, 0, 0, 0], "score": 0}
            )
        with open(self._filename, "w") as f:
            json.dump(self._results, f)

        if hasattr(self.dataset, "coco"):
            try:
                gt = self.dataset.coco
            except ValueError:
                gt = self.dataset.build_coco_json()
        else:
            gt = self.dataset.build_coco_json()  # non-COCO datasets (mscoco.py:102-105)
        coco_eval = _get_eval_backend(gt, self._filename)
        coco_eval.evaluate()
        coco_eval.accumulate()
        self._coco_eval = coco_eval
        return coco_eval

    def get(self):
        try:
            coco_eval = self._update()
        except IndexError:
            return ["mAP"], ["0.0"]
        p = coco_eval.params
        iou_thrs = np.asarray(getattr(p, "iouThrs", getattr(p, "iou_thrs", None)))
        ind_lo = int(np.where(np.isclose(iou_thrs, 0.5))[0][0])
        ind_hi = int(np.where(np.isclose(iou_thrs, 0.95))[0][0])
        precision = coco_eval.eval["precision"][ind_lo : ind_hi + 1, :, :, 0, 2]
        valid = precision[precision > -1]
        ap_default = np.mean(valid) if valid.size else float("nan")
        names, values = [], []
        names.append("~~~~ Summary metrics ~~~~\n")
        _stdout = sys.stdout
        sys.stdout = io.StringIO()
        coco_eval.summarize()
        summary = sys.stdout.getvalue()
        sys.stdout = _stdout
        values.append(summary.strip())
        for cls_ind, cls_name in enumerate(self.dataset.classes):
            pr = coco_eval.eval["precision"][ind_lo : ind_hi + 1, :, cls_ind, 0, 2]
            valid = pr[pr > -1]
            ap = np.mean(valid) if valid.size else float("nan")
            names.append(cls_name)
            values.append("{:.1f}".format(100 * ap))
        names.append("~~~~ MeanAP @ IoU=[0.50,0.95] ~~~~\n")
        values.append("{:.1f}".format(100 * ap_default))
        return names, values

    def update(self, pred_bboxes, pred_labels, pred_scores, *args, **kwargs):
        """Buffer a batch of predictions (mscoco.py:168-225)."""
        for pred_bbox, pred_label, pred_score in zip(
            *[np.asarray(x) for x in [pred_bboxes, pred_labels, pred_scores]]
        ):
            valid_pred = np.where(pred_label.flat >= 0)[0]
            pred_bbox = pred_bbox[valid_pred, :].astype(float)
            pred_label = pred_label.flat[valid_pred].astype(int)
            pred_score = pred_score.flat[valid_pred].astype(float)

            sid = self._img_ids[self._current_id]
            # results must carry the ORIGINAL json image id (the reference used
            # the contiguous sample id here, mismatching real COCO jsons —
            # mscoco.py:196; fixed in the TPU build)
            imgid = getattr(self.dataset, "sample_to_img_id", {}).get(sid, sid)
            self._current_id += 1
            if self._data_shape is not None:
                orig_width, orig_height = self.dataset.image_size(sid)
                height_scale = float(orig_height) / self._data_shape[0]
                width_scale = float(orig_width) / self._data_shape[1]
            else:
                height_scale, width_scale = 1.0, 1.0
            for bbox, label, score in zip(pred_bbox, pred_label, pred_score):
                if getattr(self.dataset, "contiguous_id_to_json", None) is not None:
                    if label not in self.dataset.contiguous_id_to_json:
                        continue
                    category_id = self.dataset.contiguous_id_to_json[label]
                else:
                    category_id = int(label)
                if score < self._score_thresh:
                    continue
                bbox = bbox.copy()
                bbox[[0, 2]] *= width_scale
                bbox[[1, 3]] *= height_scale
                # xyxy -> xywh (+1 convention, mscoco.py:221)
                bbox[2:4] -= bbox[:2] - 1
                self._results.append(
                    {
                        "image_id": int(imgid) if not isinstance(imgid, str) else imgid,
                        "category_id": int(category_id),
                        "bbox": bbox[:4].tolist(),
                        "score": float(score),
                    }
                )
