"""Golden tests for the vectorised target generator against an independent
python re-implementation of the reference scatter rules
(yolo_target.py:74-148)."""
import numpy as np
import jax.numpy as jnp

from videoyolo_tpu.ops.targets import (
    dynamic_targets,
    flat_layout,
    merge_targets,
    prefetch_targets,
)


def python_prefetch(gt_boxes, gt_ids, input_hw, num_classes, gt_mix=None):
    """Direct transcription of the reference python double loop."""
    anchors = [
        [116, 90, 156, 198, 373, 326],  # deep first (model output order)
        [30, 61, 62, 45, 59, 119],
        [10, 13, 16, 30, 33, 23],
    ]
    strides = [32, 16, 8]
    H, W = input_hw
    all_anchors = np.concatenate([np.array(a, np.float32).reshape(-1, 2) for a in anchors])
    grids = [(H // s, W // s) for s in strides]
    lens = [gh * gw * 3 for gh, gw in grids]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(int)
    total = sum(lens)
    B, M = gt_boxes.shape[:2]
    obj = np.zeros((B, total, 1), np.float32)
    center = np.zeros((B, total, 2), np.float32)
    scale = np.zeros((B, total, 2), np.float32)
    weight = np.zeros((B, total, 2), np.float32)
    clas = np.full((B, total, num_classes), -1.0, np.float32)

    def iou_wh(w1, h1, w2, h2):
        iw = min(w1, w2)
        ih = min(h1, h2)
        inter = iw * ih if (iw > 0 and ih > 0) else 0.0
        return inter / (w1 * h1 + w2 * h2 - inter)

    for b in range(B):
        for m in range(M):
            box = gt_boxes[b, m]
            if (box < 0).any():
                break
            cx = (box[0] + box[2]) / 2
            cy = (box[1] + box[3]) / 2
            w = box[2] - box[0]
            h = box[3] - box[1]
            ious = [iou_wh(w, h, a[0], a[1]) for a in all_anchors]
            match = int(np.argmax(ious))
            lvl = match // 3
            gh, gw = grids[lvl]
            loc_x = int(cx / W * gw)
            loc_y = int(cy / H * gh)
            idx = starts[lvl] + (loc_y * gw + loc_x) * 3 + (match % 3)
            center[b, idx, 0] = cx / W * gw - loc_x
            center[b, idx, 1] = cy / H * gh - loc_y
            scale[b, idx, 0] = np.log(max(w, 1) / all_anchors[match, 0])
            scale[b, idx, 1] = np.log(max(h, 1) / all_anchors[match, 1])
            weight[b, idx, :] = 2.0 - w * h / W / H
            obj[b, idx, 0] = gt_mix[b, m, 0] if gt_mix is not None else 1.0
            clas[b, idx, :] = 0.0
            if gt_ids.shape[-1] == 1:
                clas[b, idx, int(gt_ids[b, m, 0])] = 1.0
            else:
                clas[b, idx, :] = gt_ids[b, m]
    return obj, center, scale, weight, clas


def random_gt(rng, B, M, input_hw, num_classes, n_valid):
    H, W = input_hw
    boxes = np.full((B, M, 4), -1.0, np.float32)
    ids = np.full((B, M, 1), -1.0, np.float32)
    for b in range(B):
        for m in range(n_valid[b]):
            x1 = rng.uniform(0, W - 40)
            y1 = rng.uniform(0, H - 40)
            boxes[b, m] = [x1, y1, x1 + rng.uniform(8, W - x1 - 1), y1 + rng.uniform(8, H - y1 - 1)]
            ids[b, m, 0] = rng.randint(0, num_classes)
    return boxes, ids


def test_prefetch_targets_match_reference_rules():
    rng = np.random.RandomState(0)
    input_hw = (416, 416)
    boxes, ids = random_gt(rng, 3, 8, input_hw, 20, n_valid=[5, 8, 1])
    ref = python_prefetch(boxes, ids, input_hw, 20)
    got = prefetch_targets(jnp.asarray(boxes), jnp.asarray(ids), input_hw=input_hw, num_classes=20)
    names = ["obj", "center", "scale", "weight", "class"]
    for name, r, g in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-3, atol=1e-4, err_msg=name)


def test_prefetch_targets_mixup_and_multi_scale():
    rng = np.random.RandomState(3)
    input_hw = (320, 320)
    boxes, ids = random_gt(rng, 2, 4, input_hw, 7, n_valid=[3, 4])
    mix = rng.uniform(0.2, 1.0, size=(2, 4, 1)).astype(np.float32)
    ref = python_prefetch(boxes, ids, input_hw, 7, gt_mix=mix)
    got = prefetch_targets(
        jnp.asarray(boxes), jnp.asarray(ids), jnp.asarray(mix), input_hw=input_hw, num_classes=7
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-3, atol=1e-4)


def test_prefetch_targets_multihot_labels():
    """Combined-dataset tree labels pass multi-hot rows through verbatim
    (yolo_target.py:128-130)."""
    input_hw = (416, 416)
    boxes = np.array([[[50.0, 50.0, 150.0, 150.0]]], np.float32)
    multihot = np.zeros((1, 1, 10), np.float32)
    multihot[0, 0, [2, 5]] = 1.0
    got = prefetch_targets(
        jnp.asarray(boxes), jnp.asarray(multihot), input_hw=input_hw, num_classes=10
    )
    cls = np.asarray(got[4])
    hit = np.where(np.asarray(got[0])[0, :, 0] > 0)[0]
    assert len(hit) == 1
    np.testing.assert_allclose(cls[0, hit[0]], multihot[0, 0])


def test_dynamic_targets_ignore_mask():
    preds = jnp.asarray(np.array([[[0, 0, 100, 100], [200, 200, 300, 300]]], np.float32))
    gts = jnp.asarray(np.array([[[0, 0, 95, 100]]], np.float32))
    out = np.asarray(dynamic_targets(preds, gts, ignore_iou_thresh=0.7))
    assert out[0, 0, 0] == -1.0  # high IoU -> ignored
    assert out[0, 1, 0] == 0.0


def test_merge_prefetch_overrides_dynamic():
    input_hw = (416, 416)
    boxes = np.array([[[50.0, 50.0, 150.0, 150.0]]], np.float32)
    ids = np.array([[[4.0]]], np.float32)
    tg = prefetch_targets(jnp.asarray(boxes), jnp.asarray(ids), input_hw=input_hw, num_classes=20)
    n = tg[0].shape[1]
    # predictions that overlap the gt heavily everywhere
    preds = jnp.broadcast_to(jnp.asarray(boxes)[:, 0], (1, n, 4))
    merged = merge_targets(preds, jnp.asarray(boxes), *tg, num_classes=20)
    obj = np.asarray(merged[0])
    pos = np.asarray(tg[0])[0, :, 0] > 0
    # positives keep objectness 1; everything else ignored (-1) due to IoU
    assert (obj[0, pos, 0] == 1.0).all()
    assert (obj[0, ~pos, 0] == -1.0).all()
    cmask = np.asarray(merged[5])
    assert (cmask[0, pos] == 1.0).all()
    assert (cmask[0, ~pos] == 0.0).all()


def test_flat_layout_sizes():
    _, starts, grid_hw, strides, total = flat_layout((416, 416))
    assert total == (13 * 13 + 26 * 26 + 52 * 52) * 3 == 10647
    assert list(strides) == [32, 16, 8]
    assert list(starts) == [0, 507, 2535]


def test_colliding_gts_later_wins_deterministically():
    """Two gts matched to the same (cell, anchor) slot: the reference's
    sequential scatter lets the later gt overwrite (yolo_target.py:104-130);
    the vectorised scatter must resolve the collision the same way."""
    input_hw = (416, 416)
    # identical geometry -> same best anchor, same cell; different classes
    boxes = np.full((1, 4, 4), -1.0, np.float32)
    ids = np.full((1, 4, 1), -1.0, np.float32)
    boxes[0, 0] = [100, 100, 220, 220]
    ids[0, 0, 0] = 3
    boxes[0, 1] = [101, 101, 221, 221]
    ids[0, 1, 0] = 7
    ref = python_prefetch(boxes, ids, input_hw, 20)
    got = prefetch_targets(
        jnp.asarray(boxes), jnp.asarray(ids), input_hw=input_hw, num_classes=20
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), r, atol=1e-5)
    # the winning class row is gt #1's (class 7)
    cls = np.asarray(got[4])[0]
    hot = np.where(cls.max(axis=-1) > 0)[0]
    assert len(hot) == 1 and cls[hot[0], 7] == 1.0 and cls[hot[0], 3] == 0.0


def test_edge_center_clamps_to_last_cell():
    """A gt whose center sits exactly on the image's right/bottom edge must
    scatter into the LAST grid cell, not alias into the next row / next
    level's slots (floor(cx/w*grid) == grid at the boundary)."""
    input_hw = (416, 416)
    boxes = np.full((1, 4, 4), -1.0, np.float32)
    ids = np.full((1, 4, 1), -1.0, np.float32)
    # degenerate-thin box hugging the bottom-right corner: center == (416, 416)
    boxes[0, 0] = [416.0, 416.0, 416.0, 416.0]
    ids[0, 0, 0] = 3
    got = prefetch_targets(
        jnp.asarray(boxes), jnp.asarray(ids), input_hw=input_hw, num_classes=20
    )
    obj = np.asarray(got[0])[0, :, 0]
    assert np.isfinite(np.asarray(got[1])).all()
    (idx,) = np.nonzero(obj)
    assert idx.size == 1  # exactly one slot written
    # the slot lies INSIDE its level (no aliasing past the level end): the
    # winner anchor picks one level; the last cell of that level owns it
    from videoyolo_tpu.ops.targets import flat_layout

    _, starts, grid_hw, _, total = flat_layout(input_hw)
    assert idx[0] < total
    ends = list(starts[1:]) + [total]
    level = next(l for l, (s, e) in enumerate(zip(starts, ends)) if s <= idx[0] < e)
    # last cell of the level = last anchors_per_level slots
    assert idx[0] >= ends[level] - 3
