"""Golden tests for the fixed-shape batched NMS against an independent
pure-python greedy implementation of MXNet box_nms semantics
(reference call site: yolo3.py:525-530)."""
import numpy as np
import jax.numpy as jnp

from videoyolo_tpu.ops.nms import box_nms


def python_box_nms(dets, overlap_thresh=0.45, valid_thresh=0.01, topk=400,
                   post_nms=100, force_suppress=False):
    """Greedy per-class NMS, host-side gold standard."""
    def iou(a, b):
        tl = np.maximum(a[:2], b[:2])
        br = np.minimum(a[2:], b[2:])
        wh = np.maximum(br - tl, 0)
        inter = wh[0] * wh[1]
        area_a = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
        area_b = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
        union = area_a + area_b - inter
        return inter / union if union > 0 else 0.0

    valid = [r for r in dets if r[1] > valid_thresh and r[0] >= 0]
    valid.sort(key=lambda r: -r[1])
    if topk > 0:
        valid = valid[:topk]
    kept = []
    for r in valid:
        ok = True
        for kr in kept:
            if (force_suppress or kr[0] == r[0]) and iou(kr[2:6], r[2:6]) > overlap_thresh:
                ok = False
                break
        if ok:
            kept.append(r)
    out = np.full((post_nms, 6), -1.0, np.float32)
    for i, r in enumerate(kept[:post_nms]):
        out[i] = r
    return out


def make_dets(rng, n, num_classes=5, size=400):
    ids = rng.randint(0, num_classes, size=(n, 1)).astype(np.float32)
    scores = rng.uniform(0, 1, size=(n, 1)).astype(np.float32)
    xy = rng.uniform(0, size - 50, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(5, 120, size=(n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    return np.concatenate([ids, scores, boxes], axis=1)


def test_nms_matches_python_gold():
    rng = np.random.RandomState(0)
    dets = np.stack([make_dets(rng, 200) for _ in range(3)])
    got = np.asarray(box_nms(jnp.asarray(dets), post_nms=50, topk=100))
    for b in range(3):
        gold = python_box_nms(dets[b], topk=100, post_nms=50)
        np.testing.assert_allclose(got[b], gold, rtol=1e-5, atol=1e-5)


def test_nms_force_suppress():
    rng = np.random.RandomState(1)
    dets = make_dets(rng, 80)[None]
    got = np.asarray(box_nms(jnp.asarray(dets), post_nms=30, topk=60, force_suppress=True))
    gold = python_box_nms(dets[0], topk=60, post_nms=30, force_suppress=True)
    np.testing.assert_allclose(got[0], gold, rtol=1e-5, atol=1e-5)


def test_nms_valid_thresh_filters_low_scores():
    dets = np.array([[[0, 0.005, 10, 10, 50, 50],
                      [0, 0.9, 100, 100, 150, 150]]], np.float32)
    got = np.asarray(box_nms(jnp.asarray(dets), post_nms=10))
    assert got[0, 0, 1] == np.float32(0.9)
    assert (got[0, 1:] == -1).all()


def test_nms_identical_boxes_same_class_suppressed():
    dets = np.array([[[2, 0.9, 10, 10, 50, 50],
                      [2, 0.8, 10, 10, 50, 50],
                      [3, 0.7, 10, 10, 50, 50]]], np.float32)
    got = np.asarray(box_nms(jnp.asarray(dets), post_nms=3))
    # class-2 duplicate suppressed; class-3 copy kept (class-aware)
    assert got[0, 0, 1] == np.float32(0.9)
    assert got[0, 1, 1] == np.float32(0.7) and got[0, 1, 0] == 3
    assert (got[0, 2] == -1).all()


def test_nms_output_sorted_and_padded():
    rng = np.random.RandomState(2)
    dets = make_dets(rng, 30)[None]
    got = np.asarray(box_nms(jnp.asarray(dets), post_nms=100))
    scores = got[0, :, 1]
    valid = scores[scores > 0]
    assert (np.diff(valid) <= 1e-6).all()
    assert (got[0, len(valid):] == -1).all()


def test_presorted_skips_sort_but_matches():
    """presorted=True on score-descending input returns exactly the sorted
    path's output (incl. validity filtering and padding)."""
    rs = np.random.RandomState(7)
    n = 40
    scores = np.sort(rs.uniform(0, 1, n))[::-1]
    scores[-5:] = 0.001  # below valid_thresh
    x1 = rs.uniform(0, 100, (n, 1)); y1 = rs.uniform(0, 100, (n, 1))
    dets = np.concatenate(
        [rs.randint(0, 3, (n, 1)).astype(float), scores[:, None],
         x1, y1, x1 + rs.uniform(5, 40, (n, 1)), y1 + rs.uniform(5, 40, (n, 1))],
        axis=1,
    ).astype(np.float32)[None]
    want = np.asarray(box_nms(jnp.asarray(dets), topk=-1, post_nms=10))
    got = np.asarray(box_nms(jnp.asarray(dets), topk=-1, post_nms=10, presorted=True))
    np.testing.assert_allclose(got, want, atol=1e-6)
