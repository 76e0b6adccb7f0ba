"""Property-based fuzzing of ops/nms.box_nms against an independent pure-
python greedy reference (the documented `F.contrib.box_nms` semantics the
reference relies on at yolo3.py:525-530).

Shapes and the jit-static threshold arguments are drawn from small fixed
pools so the kernel compiles a bounded number of times on the 1-core CPU
host; box/score *values* are fully random, including exact-duplicate boxes
(IoU 1), exact-duplicate scores (top-k tie stability), negative ids
(invalid), and sub-valid_thresh scores.
"""
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from videoyolo_tpu.ops.nms import box_nms  # noqa: E402

N = 32  # static row count (one compile per threshold combo)


def greedy_nms_reference(dets, overlap_thresh, valid_thresh, topk, post_nms, force_suppress):
    """Sequential greedy NMS, stable score order (ties -> lower index first),
    class-aware unless force_suppress; front-packed, -1 padded."""
    ids, scores = dets[:, 0], dets[:, 1]
    valid = (scores > valid_thresh) & (ids >= 0)
    order = sorted(np.nonzero(valid)[0], key=lambda i: (-scores[i], i))
    if topk > 0:
        order = order[:topk]
    kept = []
    for i in order:
        ok = True
        for j in kept:
            if not force_suppress and ids[i] != ids[j]:
                continue
            if _iou(dets[i, 2:6], dets[j, 2:6]) > overlap_thresh:
                ok = False
                break
        if ok:
            kept.append(i)
    m = post_nms if post_nms > 0 else len(order)
    out = np.full((m, 6), -1.0, np.float32)
    for r, i in enumerate(kept[:m]):
        out[r] = dets[i]
    return out


def _iou(a, b):
    tl = np.maximum(a[:2], b[:2])
    br = np.minimum(a[2:], b[2:])
    wh = np.maximum(br - tl, 0.0)
    inter = wh[0] * wh[1]
    area = lambda x: max(x[2] - x[0], 0.0) * max(x[3] - x[1], 0.0)  # noqa: E731
    union = area(a) + area(b) - inter
    return inter / max(union, 1e-15)


@st.composite
def det_rows(draw):
    """(N,6) rows with adversarial structure: clustered boxes, duplicated
    boxes/scores, a few invalid ids and tiny scores."""
    rs = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    n_clusters = draw(st.integers(1, 6))
    centers = rs.uniform(0, 100, (n_clusters, 2))
    rows = np.zeros((N, 6), np.float32)
    for i in range(N):
        c = centers[rs.randint(n_clusters)]
        x1, y1 = c + rs.uniform(-8, 8, 2)
        w, h = rs.uniform(1, 30, 2)
        rows[i] = [rs.randint(-1, 4), rs.uniform(0, 1), x1, y1, x1 + w, y1 + h]
    # exact duplicates of earlier rows (IoU == 1 and score ties)
    for _ in range(draw(st.integers(0, 6))):
        i, j = rs.randint(N, size=2)
        rows[i, 2:6] = rows[j, 2:6]
        if draw(st.booleans()):
            rows[i, 1] = rows[j, 1]
    # a few sub-threshold scores
    rows[rs.randint(N, size=4), 1] = rs.uniform(0, 0.01, 4)
    return rows


@given(
    dets=det_rows(),
    overlap_thresh=st.sampled_from([0.3, 0.45, 0.7]),
    valid_thresh=st.sampled_from([0.0, 0.01, 0.2]),
    topk=st.sampled_from([-1, 10]),
    post_nms=st.sampled_from([8, 100]),
    force_suppress=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_box_nms_matches_greedy_reference(
    dets, overlap_thresh, valid_thresh, topk, post_nms, force_suppress
):
    got = np.asarray(
        box_nms(
            dets[None],
            overlap_thresh=overlap_thresh,
            valid_thresh=valid_thresh,
            topk=topk,
            post_nms=post_nms,
            force_suppress=force_suppress,
        )
    )[0]
    want = greedy_nms_reference(
        dets, overlap_thresh, valid_thresh, topk, post_nms, force_suppress
    )
    m = min(len(got), len(want))
    np.testing.assert_allclose(got[:m], want[:m], rtol=1e-6, atol=1e-6)
