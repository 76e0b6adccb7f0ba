"""YOLOv3 training-target generation — vectorised, on-device, jit-safe.

Capability parity with `/root/reference/models/definitions/yolo/yolo_target.py`:
  * `YOLOV3PrefetchTargetGenerator` (:13) — the reference runs a Python double
    loop over (batch, gt) inside CPU DataLoader workers (:104-130), scattering
    targets into per-level grids.  Here the same rules become a fixed-shape
    scatter executed *inside the jitted train step* on TPU, which removes the
    reference's whole async-net/deepcopy machinery
    (train_yolov3.py:332-431, yolo/transforms.py:51-58).
  * `YOLOV3DynamicTargetGeneratorSimple` (:151) — on-device ignore mask from
    pred/gt IoU.
  * `YOLOV3TargetMerger` (:208) — prefetched targets override dynamic ones,
    optional label smoothing.

Matching rules reproduced exactly (yolo_target.py:88-130):
  * each (valid) gt box is matched to the single best of all 9 anchors by IoU
    of zero-centered boxes; only the grid cell containing the gt center on
    that anchor's level receives a target;
  * center targets are the sub-cell offsets; scale targets are
    log(max(wh,1)/anchor); weights are 2 - w*h/(W*H);
  * objectness is the mixup ratio if given, else 1; class rows are one-hot
    (or copied verbatim for multi-hot tree labels, yolo_target.py:128-130);
  * everything else: class targets -1 (ignore), objectness 0.

Flat layout matches the model's deep->shallow concat order
(yolo_target.py:139-148 after slicing): for level l with grid (H_l, W_l) and
A=3 anchors, flat index = level_start_l + (loc_y * W_l + loc_x) * A + a.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .anchors import DEFAULT_ANCHORS, DEFAULT_STRIDES
from .bbox import corner_to_center, pairwise_iou

__all__ = [
    "prefetch_targets",
    "dynamic_targets",
    "merge_targets",
    "flat_layout",
]


def flat_layout(input_hw: Tuple[int, int], anchors=DEFAULT_ANCHORS, strides=DEFAULT_STRIDES):
    """Static tables for the deep->shallow flat prediction layout.

    Returns (all_anchors (9,2) deep-first, level_starts (L,), grid_hw (L,2),
    strides_rev (L,), total N).
    """
    anchors_rev = list(anchors)[::-1]
    strides_rev = list(strides)[::-1]
    h, w = input_hw
    all_anchors = np.concatenate(
        [np.asarray(a, np.float32).reshape(-1, 2) for a in anchors_rev], axis=0
    )
    grid_hw = np.asarray([(h // s, w // s) for s in strides_rev], np.int32)
    num_per_level = [gh * gw * (len(anchors_rev[l]) // 2) for l, (gh, gw) in enumerate(grid_hw)]
    starts = np.concatenate([[0], np.cumsum(num_per_level)[:-1]]).astype(np.int32)
    total = int(np.sum(num_per_level))
    return all_anchors, starts, grid_hw, np.asarray(strides_rev, np.int32), total


def _prefetch_single(
    gt_boxes,  # (M, 4) corner, padded with -1
    gt_ids,  # (M, 1) class ids or (M, C) multi-hot
    gt_mix,  # (M, 1) or None
    *,
    all_anchors,  # (9, 2) deep-first
    level_starts,  # (L,)
    grid_hw,  # (L, 2)
    num_classes: int,
    input_hw: Tuple[int, int],
    total: int,
    anchors_per_level_n: int,
):
    orig_h, orig_w = input_hw
    m = gt_boxes.shape[0]

    valid = jnp.all(gt_boxes[:, :4] >= 0, axis=-1)  # (M,)

    cx, cy, gw, gh = corner_to_center(gt_boxes, split=True)
    cx, cy, gw, gh = cx[:, 0], cy[:, 0], gw[:, 0], gh[:, 0]

    # best anchor per gt: IoU of zero-centered boxes (yolo_target.py:88-94)
    shift_gt = jnp.stack([-0.5 * gw, -0.5 * gh, 0.5 * gw, 0.5 * gh], axis=-1)  # (M,4)
    aw, ah = all_anchors[:, 0], all_anchors[:, 1]
    shift_anchor = jnp.stack([-0.5 * aw, -0.5 * ah, 0.5 * aw, 0.5 * ah], axis=-1)  # (9,4)
    ious = pairwise_iou(shift_gt, shift_anchor)  # (M, 9)
    match = jnp.argmax(ious, axis=-1)  # (M,)

    level = match // anchors_per_level_n
    local_a = match % anchors_per_level_n
    gh_l = grid_hw[level, 0].astype(jnp.float32)
    gw_l = grid_hw[level, 1].astype(jnp.float32)

    # clamp to the last cell: a gt center on the image's right/bottom edge
    # (or float32 rounding of cx/orig_w*gw pushing past it) would otherwise
    # compute loc == grid size and alias the scatter into the next row /
    # next level's first slots (the reference's numpy indexing would raise;
    # the clamped cell is the one that contains the center)
    loc_x = jnp.clip(jnp.floor(cx / orig_w * gw_l), 0, gw_l - 1).astype(jnp.int32)
    loc_y = jnp.clip(jnp.floor(cy / orig_h * gh_l), 0, gh_l - 1).astype(jnp.int32)

    flat = (
        level_starts[level]
        + (loc_y * grid_hw[level, 1] + loc_x) * anchors_per_level_n
        + local_a
    )
    # invalid gts scatter out of bounds -> dropped
    flat = jnp.where(valid, flat, total)

    # collision determinism: when two gts land on the same (cell, anchor)
    # slot the reference's sequential loop lets the LATER gt overwrite
    # (yolo_target.py:104-130); JAX scatter with duplicate indices is
    # unspecified, so resolve first — scatter-max of the gt index picks the
    # winner per slot, losers are redirected out of bounds and dropped.
    gt_rank = jnp.arange(m, dtype=jnp.int32)
    slot_winner = (
        jnp.full((total + 1,), -1, jnp.int32).at[flat].max(gt_rank, mode="drop")
    )
    flat = jnp.where(slot_winner[flat] == gt_rank, flat, total)

    tx = cx / orig_w * gw_l - loc_x
    ty = cy / orig_h * gh_l - loc_y
    anchor_w = all_anchors[match, 0]
    anchor_h = all_anchors[match, 1]
    sx = jnp.log(jnp.maximum(gw, 1.0) / anchor_w)
    sy = jnp.log(jnp.maximum(gh, 1.0) / anchor_h)
    wt = 2.0 - gw * gh / orig_w / orig_h
    obj = gt_mix[:, 0] if gt_mix is not None else jnp.ones((m,), jnp.float32)

    if gt_ids.shape[-1] == 1:
        cls_rows = jax.nn.one_hot(gt_ids[:, 0].astype(jnp.int32), num_classes)
    else:
        cls_rows = gt_ids.astype(jnp.float32)  # multi-hot tree labels

    center_t = jnp.zeros((total, 2), jnp.float32).at[flat].set(
        jnp.stack([tx, ty], -1), mode="drop"
    )
    scale_t = jnp.zeros((total, 2), jnp.float32).at[flat].set(
        jnp.stack([sx, sy], -1), mode="drop"
    )
    weight_t = jnp.zeros((total, 2), jnp.float32).at[flat].set(
        jnp.stack([wt, wt], -1), mode="drop"
    )
    obj_t = jnp.zeros((total, 1), jnp.float32).at[flat].set(obj[:, None], mode="drop")
    class_t = jnp.full((total, num_classes), -1.0, jnp.float32).at[flat].set(
        cls_rows, mode="drop"
    )
    return obj_t, center_t, scale_t, weight_t, class_t


@partial(
    jax.jit,
    static_argnames=("input_hw", "num_classes", "anchors", "strides"),
)
def prefetch_targets(
    gt_boxes: jnp.ndarray,  # (B, M, 4) corner boxes in input pixels, -1 padded
    gt_ids: jnp.ndarray,  # (B, M, 1) ids or (B, M, C) multi-hot
    gt_mixratio: jnp.ndarray | None = None,  # (B, M, 1)
    *,
    input_hw: Tuple[int, int],
    num_classes: int,
    anchors=DEFAULT_ANCHORS,
    strides=DEFAULT_STRIDES,
):
    """Batched prefetch targets.  Returns (objectness (B,N,1), center (B,N,2),
    scale (B,N,2), weight (B,N,2), class (B,N,C)) in the model's flat order."""
    all_anchors, starts, grid_hw, _, total = flat_layout(input_hw, anchors, strides)
    apl = len(anchors[0]) // 2
    fn = partial(
        _prefetch_single,
        all_anchors=jnp.asarray(all_anchors),
        level_starts=jnp.asarray(starts),
        grid_hw=jnp.asarray(grid_hw),
        num_classes=num_classes,
        input_hw=input_hw,
        total=total,
        anchors_per_level_n=apl,
    )
    if gt_mixratio is None:
        return jax.vmap(lambda b, i: fn(b, i, None))(gt_boxes, gt_ids)
    return jax.vmap(fn)(gt_boxes, gt_ids, gt_mixratio)


def dynamic_targets(
    box_preds: jnp.ndarray,  # (B, N, 4) decoded corner boxes
    gt_boxes: jnp.ndarray,  # (B, M, 4)
    ignore_iou_thresh: float = 0.7,
):
    """Ignore-mask objectness from pred/gt IoU (yolo_target.py:151-205).

    Returns objectness (B,N,1) with -1 where max-IoU > thresh, else 0.
    """
    ious = pairwise_iou(box_preds, gt_boxes)  # (B, N, M)
    ious_max = jnp.max(ious, axis=-1, keepdims=True)
    return (ious_max > ignore_iou_thresh).astype(jnp.float32) * -1.0


def merge_targets(
    box_preds: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    obj_t: jnp.ndarray,
    centers_t: jnp.ndarray,
    scales_t: jnp.ndarray,
    weights_t: jnp.ndarray,
    clas_t: jnp.ndarray,
    num_classes: int,
    ignore_iou_thresh: float = 0.7,
    label_smooth: bool = False,
):
    """Merge prefetched + dynamic targets (yolo_target.py:208-281).

    Returns (objectness, center_t, scale_t, weight_t, class_t, class_mask),
    all stop-gradient'ed.
    """
    dyn_obj = dynamic_targets(box_preds, gt_boxes, ignore_iou_thresh)
    mask = obj_t > 0
    objectness = jnp.where(mask, obj_t, dyn_obj)
    center_targets = jnp.where(mask, centers_t, 0.0)
    scale_targets = jnp.where(mask, scales_t, 0.0)
    weights = jnp.where(mask, weights_t, 0.0)
    class_targets = jnp.where(mask, clas_t, -1.0)
    if label_smooth:
        smooth_weight = min(1.0 / num_classes, 1.0 / 40)
        class_targets = jnp.where(
            class_targets > 0.5, class_targets - smooth_weight, class_targets
        )
        class_targets = jnp.where(
            (class_targets < -0.5) | (class_targets > 0.5),
            class_targets,
            jnp.full_like(class_targets, smooth_weight),
        )
    class_mask = mask.astype(jnp.float32) * (class_targets >= 0)
    out = (objectness, center_targets, scale_targets, weights, class_targets, class_mask)
    return tuple(jax.lax.stop_gradient(o) for o in out)
