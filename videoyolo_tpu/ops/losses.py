"""YOLOv3 loss — semantics of gluoncv's `YOLOV3Loss` used by the reference at
`/root/reference/models/definitions/yolo/yolo3.py:409,520`.

Components (per sample, shape (B,)):
  * objectness: sigmoid BCE with hard 0/1 targets (mixup ratios become hard 1)
    masked so ignored anchors (objectness target -1) contribute nothing;
  * center: sigmoid BCE against sub-cell offsets, weighted by
    (2 - box_area_fraction) * objectness;
  * scale: L1 on log-scale targets, same weighting;
  * class: sigmoid BCE over per-class logits, masked to matched anchors with
    non-ignored class rows.

Each component is a *sum* over non-batch elements (gluon computes a mean and
multiplies by `denorm`, the non-batch element count — same thing).  The
caller averages over the global batch (reference Trainer.step(batch_size)
rescales grads by 1/batch_size, train_yolov3.py:633-636).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["sigmoid_bce", "weighted_l1", "yolo3_loss"]


def sigmoid_bce(pred: jnp.ndarray, label: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Elementwise sigmoid binary cross-entropy from logits, weighted, summed
    over non-batch axes.  Matches gluon SigmoidBinaryCrossEntropyLoss
    (from_sigmoid=False): relu(x) - x*y + log(1 + exp(-|x|))."""
    loss = jnp.maximum(pred, 0.0) - pred * label + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = loss * weight
    return jnp.sum(loss.reshape(loss.shape[0], -1), axis=-1)


def weighted_l1(pred: jnp.ndarray, label: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted L1, summed over non-batch axes (gluon L1Loss * denorm)."""
    loss = jnp.abs(pred - label) * weight
    return jnp.sum(loss.reshape(loss.shape[0], -1), axis=-1)


def yolo3_loss(
    objness: jnp.ndarray,  # (B, N, 1) logits
    box_centers: jnp.ndarray,  # (B, N, 2) logits
    box_scales: jnp.ndarray,  # (B, N, 2) raw
    cls_preds: jnp.ndarray,  # (B, N, C) logits
    objness_t: jnp.ndarray,
    center_t: jnp.ndarray,
    scale_t: jnp.ndarray,
    weight_t: jnp.ndarray,
    class_t: jnp.ndarray,
    class_mask: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Returns dict of per-sample (B,) losses: obj, center, scale, cls."""
    weight_t = weight_t * objness_t
    hard_objness_t = jnp.where(objness_t > 0, jnp.ones_like(objness_t), objness_t)
    new_objness_mask = jnp.where(objness_t > 0, objness_t, (objness_t >= 0).astype(objness_t.dtype))

    obj_loss = sigmoid_bce(objness, hard_objness_t, new_objness_mask)
    center_loss = sigmoid_bce(box_centers, center_t, weight_t)
    scale_loss = weighted_l1(box_scales, scale_t, weight_t)
    class_mask = class_mask * objness_t
    cls_loss = sigmoid_bce(cls_preds, class_t, class_mask)
    return {
        "obj": obj_loss,
        "center": center_loss,
        "scale": scale_loss,
        "cls": cls_loss,
    }
