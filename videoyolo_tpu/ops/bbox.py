"""Bounding-box math (jnp + numpy).

Capability parity with the reference's box utilities
(`/root/reference/utils/bbox.py:11-141` and gluoncv's BBoxCornerToCenter /
BBoxCenterToCorner / BBoxBatchIOU nn blocks used by
`/root/reference/models/definitions/yolo/yolo_target.py:10`), re-expressed as
pure, jit-safe functions that vectorise over arbitrary leading batch axes.

Boxes are float arrays whose last axis is 4:
  corner format: (xmin, ymin, xmax, ymax)
  center format: (cx, cy, w, h)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "corner_to_center",
    "center_to_corner",
    "box_iou",
    "pairwise_iou",
    "np_bbox_iou",
    "bbox_xywh_to_xyxy",
    "bbox_xyxy_to_xywh",
    "bbox_clip_xyxy",
]


def corner_to_center(boxes, split: bool = False):
    """(xmin,ymin,xmax,ymax) -> (cx,cy,w,h). Mirrors gluoncv BBoxCornerToCenter."""
    xmin, ymin, xmax, ymax = jnp.split(boxes[..., :4], 4, axis=-1)
    w = xmax - xmin
    h = ymax - ymin
    cx = xmin + w / 2
    cy = ymin + h / 2
    if split:
        return cx, cy, w, h
    return jnp.concatenate([cx, cy, w, h], axis=-1)


def center_to_corner(boxes, split: bool = False):
    """(cx,cy,w,h) -> (xmin,ymin,xmax,ymax). Mirrors gluoncv BBoxCenterToCorner."""
    cx, cy, w, h = jnp.split(boxes[..., :4], 4, axis=-1)
    hw = w / 2
    hh = h / 2
    xmin = cx - hw
    ymin = cy - hh
    xmax = cx + hw
    ymax = cy + hh
    if split:
        return xmin, ymin, xmax, ymax
    return jnp.concatenate([xmin, ymin, xmax, ymax], axis=-1)


def pairwise_iou(boxes_a, boxes_b, offset: float = 0.0, eps: float = 1e-15):
    """IoU between every box pair: (..., N, 4) x (..., M, 4) -> (..., N, M).

    Matches the reference numpy `bbox_iou` (utils/bbox.py:11-39) including the
    `offset` convention (w = xmax - xmin + offset) and zero intersection when
    boxes do not overlap.  Fully batched / jit-safe.
    """
    a = boxes_a[..., :, None, :4]
    b = boxes_b[..., None, :, :4]
    tl = jnp.maximum(a[..., :2], b[..., :2])
    br = jnp.minimum(a[..., 2:4], b[..., 2:4])
    valid = jnp.all(tl < br, axis=-1)
    area_i = jnp.prod(br - tl + offset, axis=-1) * valid
    area_a = jnp.prod(boxes_a[..., 2:4] - boxes_a[..., :2] + offset, axis=-1)
    area_b = jnp.prod(boxes_b[..., 2:4] - boxes_b[..., :2] + offset, axis=-1)
    union = area_a[..., :, None] + area_b[..., None, :] - area_i
    return area_i / jnp.maximum(union, eps)


# Alias matching the "batch IoU" role of gluoncv's BBoxBatchIOU
# (used on-device by the dynamic target generator, yolo_target.py:174).
box_iou = pairwise_iou


def np_bbox_iou(bbox_a: np.ndarray, bbox_b: np.ndarray, offset: float = 0) -> np.ndarray:
    """Host-side numpy IoU, bit-identical to reference utils/bbox.py:11-39.

    Used by the host-side metrics (VOC/VID mAP matching) which the reference
    also computes in numpy.
    """
    if bbox_a.shape[1] < 4 or bbox_b.shape[1] < 4:
        raise IndexError("Bounding boxes axis 1 must have at least length 4")
    tl = np.maximum(bbox_a[:, None, :2], bbox_b[:, :2])
    br = np.minimum(bbox_a[:, None, 2:4], bbox_b[:, 2:4])
    area_i = np.prod(br - tl + offset, axis=2) * (tl < br).all(axis=2)
    area_a = np.prod(bbox_a[:, 2:4] - bbox_a[:, :2] + offset, axis=1)
    area_b = np.prod(bbox_b[:, 2:4] - bbox_b[:, :2] + offset, axis=1)
    return area_i / (area_a[:, None] + area_b - area_i)


def bbox_xywh_to_xyxy(xywh):
    """(x, y, w, h) -> (xmin, ymin, xmax, ymax); ref utils/bbox.py:41-77."""
    if isinstance(xywh, (tuple, list)):
        if not len(xywh) == 4:
            raise IndexError(f"Bounding boxes must have 4 elements, given {len(xywh)}")
        w, h = np.maximum(xywh[2] - 1, 0), np.maximum(xywh[3] - 1, 0)
        return xywh[0], xywh[1], xywh[0] + w, xywh[1] + h
    if isinstance(xywh, np.ndarray):
        if not xywh.size % 4 == 0:
            raise IndexError(f"Bounding boxes must have n * 4 elements, given {xywh.shape}")
        xyxy = np.hstack((xywh[:, :2], xywh[:, :2] + np.maximum(0, xywh[:, 2:4] - 1)))
        return xyxy
    raise TypeError(f"Expect input to be (tuple, list, numpy.ndarray), given {type(xywh)}")


def bbox_xyxy_to_xywh(xyxy):
    """(xmin, ymin, xmax, ymax) -> (x, y, w, h); ref utils/bbox.py:80-110."""
    if isinstance(xyxy, (tuple, list)):
        if not len(xyxy) == 4:
            raise IndexError(f"Bounding boxes must have 4 elements, given {len(xyxy)}")
        x1, y1 = xyxy[0], xyxy[1]
        w, h = xyxy[2] - x1 + 1, xyxy[3] - y1 + 1
        return x1, y1, w, h
    if isinstance(xyxy, np.ndarray):
        if not xyxy.size % 4 == 0:
            raise IndexError(f"Bounding boxes must have n * 4 elements, given {xyxy.shape}")
        return np.hstack((xyxy[:, :2], xyxy[:, 2:4] - xyxy[:, :2] + 1))
    raise TypeError(f"Expect input to be (tuple, list, numpy.ndarray), given {type(xyxy)}")


def bbox_clip_xyxy(xyxy, width, height):
    """Clip corner boxes to image bounds; ref utils/bbox.py:113-141."""
    if isinstance(xyxy, (tuple, list)):
        if not len(xyxy) == 4:
            raise IndexError(f"Bounding boxes must have 4 elements, given {len(xyxy)}")
        x1 = np.minimum(width - 1, np.maximum(0, xyxy[0]))
        y1 = np.minimum(height - 1, np.maximum(0, xyxy[1]))
        x2 = np.minimum(width - 1, np.maximum(0, xyxy[2]))
        y2 = np.minimum(height - 1, np.maximum(0, xyxy[3]))
        return x1, y1, x2, y2
    if isinstance(xyxy, np.ndarray):
        if not xyxy.size % 4 == 0:
            raise IndexError(f"Bounding boxes must have n * 4 elements, given {xyxy.shape}")
        x1 = np.minimum(width - 1, np.maximum(0, xyxy[:, 0]))
        y1 = np.minimum(height - 1, np.maximum(0, xyxy[:, 1]))
        x2 = np.minimum(width - 1, np.maximum(0, xyxy[:, 2]))
        y2 = np.minimum(height - 1, np.maximum(0, xyxy[:, 3]))
        return np.stack((x1, y1, x2, y2), axis=1)
    raise TypeError(f"Expect input to be (tuple, list, numpy.ndarray), given {type(xyxy)}")
