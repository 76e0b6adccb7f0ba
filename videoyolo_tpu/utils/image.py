"""OpenCV bbox rendering (reference `/root/reference/utils/image.py:5-47`)."""
from __future__ import annotations

import random
from typing import Optional, Sequence

import cv2
import numpy as np


def cv_plot_bbox(
    img: np.ndarray,
    bboxes: np.ndarray,
    scores: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    thresh: float = 0.5,
    class_names: Optional[Sequence[str]] = None,
    colors: Optional[dict] = None,
    absolute_coordinates: bool = True,
) -> np.ndarray:
    """Draw boxes (xyxy) with class/score text onto an RGB HWC image."""
    img = img.copy()
    if len(bboxes) < 1:
        return img
    if not absolute_coordinates:
        height, width = img.shape[0], img.shape[1]
        bboxes = bboxes.copy()
        bboxes[:, (0, 2)] *= width
        bboxes[:, (1, 3)] *= height
    if colors is None:
        colors = {}
    for i, bbox in enumerate(bboxes):
        if scores is not None and float(scores.flat[i]) < thresh:
            continue
        cls_id = int(labels.flat[i]) if labels is not None else -1
        if cls_id < 0 and labels is not None:
            continue
        if cls_id not in colors:
            random.seed(cls_id + 1)
            colors[cls_id] = tuple(random.randint(0, 255) for _ in range(3))
        x1, y1, x2, y2 = [int(v) for v in bbox[:4]]
        cv2.rectangle(img, (x1, y1), (x2, y2), colors[cls_id], 2)
        if class_names is not None and 0 <= cls_id < len(class_names):
            name = class_names[cls_id]
        elif cls_id >= 0:
            name = str(cls_id)
        else:
            name = ""
        score_txt = f" {float(scores.flat[i]):.3f}" if scores is not None else ""
        if name or score_txt:
            cv2.putText(
                img, name + score_txt, (x1, max(y1 - 5, 0)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, colors[cls_id], 1,
            )
    return img
