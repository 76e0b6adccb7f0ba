"""Shape/behaviour tests for the Darknet-53 + YOLOv3 model family,
the equivalent of the reference's `net.summary(...)` smoke blocks
(darknet.py:141-145, train_yolov3.py:735-758) plus real assertions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoyolo_tpu.models.darknet import Darknet53
from videoyolo_tpu.models.yolo3 import YOLOv3, flatten_detections, postprocess


@pytest.fixture(scope="module")
def voc_model():
    model = YOLOv3(num_classes=20)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_darknet_routes_shapes():
    model = Darknet53()
    x = jnp.zeros((1, 416, 416, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    r1, r2, r3 = model.apply(variables, x, train=False)
    assert r1.shape == (1, 52, 52, 256)
    assert r2.shape == (1, 26, 26, 512)
    assert r3.shape == (1, 13, 13, 1024)


def test_param_count_matches_reference_scale(voc_model):
    # yolo3_darknet53 VOC has ~61.6M params
    _, variables = voc_model
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 61_000_000 < n < 62_500_000


def test_inference_shapes(voc_model):
    model, variables = voc_model
    x = jnp.zeros((2, 160, 160, 3), jnp.float32)
    boxes, scores = model.apply(variables, x, train=False)
    n = ((160 // 32) ** 2 + (160 // 16) ** 2 + (160 // 8) ** 2) * 3
    assert boxes.shape == (2, n, 4)
    assert scores.shape == (2, n, 20)
    ids, sc, bb = postprocess(boxes, scores)
    assert ids.shape == (2, 100, 1) and sc.shape == (2, 100, 1) and bb.shape == (2, 100, 4)


@pytest.mark.parametrize("size", [96, 224])
def test_multi_scale_inference(voc_model, size):
    """Random-shape training contract: shapes 320..608 in steps of 32
    (train_yolov3.py:269-271)."""
    model, variables = voc_model
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    boxes, scores = model.apply(variables, x, train=False)
    n = ((size // 32) ** 2 + (size // 16) ** 2 + (size // 8) ** 2) * 3
    assert boxes.shape == (1, n, 4)


def test_train_outputs(voc_model):
    model, variables = voc_model
    x = jnp.zeros((2, 160, 160, 3), jnp.float32)
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    n = ((160 // 32) ** 2 + (160 // 16) ** 2 + (160 // 8) ** 2) * 3
    assert out["bbox"].shape == (2, n, 4)
    assert out["objness"].shape == (2, n, 1)
    assert out["class_pred"].shape == (2, n, 20)
    assert "batch_stats" in mutated


def test_noback_head_only():
    """yolo3_no_backbone capability (yolo3.py:1686, wrappers.py:133)."""
    model = YOLOv3(num_classes=20, use_backbone=False)
    feats = (
        jnp.zeros((1, 52, 52, 256)),
        jnp.zeros((1, 26, 26, 512)),
        jnp.zeros((1, 13, 13, 1024)),
    )
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    boxes, scores = model.apply(variables, feats, train=False)
    assert boxes.shape == (1, 10647, 4)


def test_agnostic_mode():
    model = YOLOv3(num_classes=20, agnostic=True)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    boxes, scores = model.apply(variables, x, train=False)
    assert scores.shape == (1, boxes.shape[1], 1)


def test_flatten_detections_matches_reference_order(voc_model):
    model, variables = voc_model
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    boxes, scores = model.apply(variables, x, train=False)
    dets = np.asarray(flatten_detections(boxes, scores))
    n = boxes.shape[1]
    # class-major order: block c covers rows [c*n, (c+1)*n)
    assert (dets[0, :n, 0] == 0).all()
    assert (dets[0, n : 2 * n, 0] == 1).all()
    np.testing.assert_allclose(dets[0, n : 2 * n, 2:], np.asarray(boxes)[0], rtol=1e-6)


def test_decode_center_in_bounds(voc_model):
    """Anchor decode sanity: box centers must lie within the image for any
    logits (sigmoid bounds sub-cell offsets)."""
    model, variables = voc_model
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 160, 160, 3)) * 3
    boxes, _ = model.apply(variables, x, train=False)
    centers = np.asarray((boxes[..., :2] + boxes[..., 2:]) / 2)
    assert centers.min() >= 0.0
    assert centers.max() <= 160.0


def test_select_topk_candidates_matches_flat_topk():
    """The two-stage (box-pool -> pair) selection is exact: identical rows to
    a naive top-k over the flattened (N*C) score matrix (distinct scores)."""
    from videoyolo_tpu.models.yolo3 import select_topk_candidates

    rs = np.random.RandomState(3)
    b, n, c, k = 2, 700, 7, 40
    scores = rs.uniform(0, 1, (b, n, c)).astype(np.float32)
    boxes = rs.uniform(0, 100, (b, n, 4)).astype(np.float32)
    got = np.asarray(
        select_topk_candidates(jnp.asarray(boxes), jnp.asarray(scores), topk=k)
    )
    flat = scores.reshape(b, n * c)
    for bi in range(b):
        order = np.argsort(-flat[bi], kind="stable")[:k]
        np.testing.assert_array_equal(got[bi, :, 1], flat[bi][order])
        np.testing.assert_array_equal(got[bi, :, 0], (order % c).astype(np.float32))
        np.testing.assert_array_equal(got[bi, :, 2:], boxes[bi][order // c])


def test_select_topk_candidates_approx_recall():
    """`approx_recall` (lax.approx_max_k candidate pool) keeps the output
    contract: same (B,K,6) shape, scores sorted descending (the NMS
    presorted invariant), and pool recall vs the exact selection well above
    the per-stage target on random scores (the worst case for approximate
    selection: near-uniform values at the k-th threshold)."""
    from videoyolo_tpu.models.yolo3 import select_topk_candidates

    rs = np.random.RandomState(5)
    b, n, c, k = 2, 700, 7, 40
    scores = jnp.asarray(rs.uniform(0, 1, (b, n, c)).astype(np.float32))
    boxes = jnp.asarray(rs.uniform(0, 100, (b, n, 4)).astype(np.float32))
    exact = np.asarray(select_topk_candidates(boxes, scores, topk=k))
    approx = np.asarray(
        select_topk_candidates(boxes, scores, topk=k, approx_recall=0.95)
    )
    assert approx.shape == (b, k, 6)
    for bi in range(b):
        sc = approx[bi, :, 1]
        assert (np.diff(sc) <= 1e-7).all(), "candidates must stay presorted"
        ekeys = {tuple(r) for r in np.round(exact[bi], 4)}
        akeys = {tuple(r) for r in np.round(approx[bi], 4)}
        # two approx stages at 0.95 each => >= ~0.90 expected; assert a
        # loose floor so backend differences can't flake the test
        assert len(ekeys & akeys) / len(ekeys) >= 0.85


def test_select_topk_candidates_fewer_boxes_than_k():
    from videoyolo_tpu.models.yolo3 import select_topk_candidates

    rs = np.random.RandomState(4)
    b, n, c, k = 2, 20, 7, 40
    scores = jnp.asarray(rs.uniform(0, 1, (b, n, c)).astype(np.float32))
    boxes = jnp.asarray(rs.uniform(0, 100, (b, n, 4)).astype(np.float32))
    out = select_topk_candidates(boxes, scores, topk=k)
    assert out.shape == (b, k, 6)


def test_decode_predictions_matches_numpy_transcription():
    """decode_predictions vs an independent numpy transcription of the
    reference decode (yolo3.py:155-199): sigmoid centers + meshgrid offsets
    times stride, exp scales times anchors, per-class sigmoid*conf scores,
    corner boxes — eval and train branches."""
    from videoyolo_tpu.models.yolo3 import decode_predictions

    rs = np.random.RandomState(11)
    B, H, W, C = 2, 5, 7, 4
    anchors = ((10.0, 13.0), (16.0, 30.0), (33.0, 23.0))
    A, P, stride = len(anchors), 5 + C, 16
    raw = rs.randn(B, H, W, A * P).astype(np.float32)

    boxes, scores, conf = decode_predictions(
        jnp.asarray(raw), anchors, stride, C, train=False
    )

    # independent numpy version
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    p = raw.reshape(B, H * W, A, P)
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))  # gx varies fastest
    offs = np.stack([gx, gy], -1).reshape(1, H * W, 1, 2)
    centers = (sig(p[..., 0:2]) + offs) * stride
    scales = np.exp(p[..., 2:4]) * np.asarray(anchors).reshape(1, 1, A, 2)
    want_boxes = np.concatenate(
        [centers - scales / 2, centers + scales / 2], -1
    ).reshape(B, -1, 4)
    want_conf = sig(p[..., 4:5]).reshape(B, -1, 1)
    want_scores = (sig(p[..., 5:]) * sig(p[..., 4:5])).reshape(B, -1, C)

    np.testing.assert_allclose(np.asarray(boxes), want_boxes, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), want_scores, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(conf), want_conf, rtol=1e-5, atol=1e-6)

    # train branch returns the raw heads at matching layouts
    heads = decode_predictions(jnp.asarray(raw), anchors, stride, C, train=True)
    np.testing.assert_allclose(
        np.asarray(heads["bbox"]), want_boxes, rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(heads["raw_centers"]), p[..., 0:2].reshape(B, -1, 2), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(heads["class_pred"]), p[..., 5:].reshape(B, -1, C), rtol=1e-6
    )


def test_postprocess_levels_matches_single_pass():
    """Per-level selection + merge (postprocess_levels) returns the same
    detections as the single-pass postprocess on the concatenated tensors
    (distinct scores -> no tie ambiguity)."""
    from videoyolo_tpu.models.yolo3 import postprocess, postprocess_levels

    rs = np.random.RandomState(11)
    b, c = 2, 6
    levels = []
    for n in (300, 120, 40):
        scores = rs.uniform(0, 1, (b, n, c)).astype(np.float32)
        x1 = rs.uniform(0, 200, (b, n, 1)); y1 = rs.uniform(0, 200, (b, n, 1))
        boxes = np.concatenate(
            [x1, y1, x1 + rs.uniform(5, 80, (b, n, 1)), y1 + rs.uniform(5, 80, (b, n, 1))],
            axis=-1,
        ).astype(np.float32)
        levels.append((jnp.asarray(boxes), jnp.asarray(scores)))

    all_boxes = jnp.concatenate([l[0] for l in levels], axis=1)
    all_scores = jnp.concatenate([l[1] for l in levels], axis=1)
    want = postprocess(all_boxes, all_scores, nms_topk=50, post_nms=20)
    got = postprocess_levels(levels, nms_topk=50, post_nms=20)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-6)


def test_postprocess_tout_folds_per_timestep():
    """postprocess_tout on (B,T,N,...) equals postprocess run on each
    timestep independently (the shared fold every t_out call site uses),
    and passes (B,N,...) straight through."""
    from videoyolo_tpu.models.yolo3 import postprocess, postprocess_tout

    rs = np.random.RandomState(13)
    b, t, n, c = 2, 3, 150, 4
    scores = rs.uniform(0, 1, (b, t, n, c)).astype(np.float32)
    x1 = rs.uniform(0, 200, (b, t, n, 1)); y1 = rs.uniform(0, 200, (b, t, n, 1))
    boxes = np.concatenate(
        [x1, y1, x1 + rs.uniform(5, 80, (b, t, n, 1)),
         y1 + rs.uniform(5, 80, (b, t, n, 1))], axis=-1,
    ).astype(np.float32)

    got = postprocess_tout(jnp.asarray(boxes), jnp.asarray(scores),
                           nms_topk=50, post_nms=20)
    assert got[0].shape[:2] == (b, t)
    for bi in range(b):
        for ti in range(t):
            want = postprocess(jnp.asarray(boxes[bi:bi + 1, ti]),
                               jnp.asarray(scores[bi:bi + 1, ti]),
                               nms_topk=50, post_nms=20)
            for w, g in zip(want, got):
                np.testing.assert_allclose(
                    np.asarray(w)[0], np.asarray(g)[bi, ti], atol=1e-6
                )

    flat = postprocess(jnp.asarray(boxes[:, 0]), jnp.asarray(scores[:, 0]),
                       nms_topk=50, post_nms=20)
    flat_t = postprocess_tout(jnp.asarray(boxes[:, 0]), jnp.asarray(scores[:, 0]),
                              nms_topk=50, post_nms=20)
    for w, g in zip(flat, flat_t):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-6)


def test_return_levels_matches_concat_contract():
    """YOLOv3(return_levels=True) emits per-level pairs whose concatenation
    equals the default eval contract."""
    import dataclasses

    from videoyolo_tpu.models.yolo3 import YOLOv3

    model = YOLOv3(num_classes=3)
    x = jnp.asarray(np.random.RandomState(12).rand(1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    boxes, scores = model.apply(variables, x, train=False)
    lv = dataclasses.replace(model, return_levels=True).apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([p[0] for p in lv], axis=1)), np.asarray(boxes), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([p[1] for p in lv], axis=1)), np.asarray(scores), rtol=1e-6
    )


def test_bf16_select_close_to_exact():
    """select_dtype=bf16: same boxes for clearly-separated scores; scores
    within bf16 rounding."""
    from videoyolo_tpu.models.yolo3 import select_topk_candidates

    rs = np.random.RandomState(13)
    b, n, c, k = 2, 500, 5, 30
    # top candidates spaced 0.01 apart (well beyond bf16 resolution in
    # [0.4, 1)) so the selected set is identical; the rest sit near zero
    scores = rs.uniform(0, 1e-3, (b, n, c)).astype(np.float32)
    for bi in range(b):
        flat_idx = rs.choice(n * c, 60, replace=False)
        scores[bi].ravel()[flat_idx] = 0.99 - 0.01 * np.arange(60)
    boxes = rs.uniform(0, 100, (b, n, 4)).astype(np.float32)
    exact = np.asarray(select_topk_candidates(jnp.asarray(boxes), jnp.asarray(scores), topk=k))
    fast = np.asarray(
        select_topk_candidates(
            jnp.asarray(boxes), jnp.asarray(scores), topk=k, select_dtype=jnp.bfloat16
        )
    )
    np.testing.assert_array_equal(exact[..., 0], fast[..., 0])  # classes
    np.testing.assert_array_equal(exact[..., 2:], fast[..., 2:])  # boxes exact
    np.testing.assert_allclose(exact[..., 1], fast[..., 1], rtol=1e-2)


def test_postprocess_topk_disabled_keeps_all_pairs():
    """nms_topk <= 0 = NO top-k cap (reference set_nms(nms_topk=-1)): every
    (box, class) pair above valid_thresh must survive into the NMS pool
    (this crashed with an IndexError on a size-0 candidate set before)."""
    from videoyolo_tpu.models.yolo3 import postprocess

    rs = np.random.RandomState(14)
    b, n, c = 1, 30, 4
    scores = rs.uniform(0.2, 1.0, (b, n, c)).astype(np.float32)
    x1 = rs.uniform(0, 500, (b, n, 1)); y1 = rs.uniform(0, 500, (b, n, 1))
    # tiny spread boxes: no suppression, so everything must come through
    boxes = np.concatenate([x1, y1, x1 + 2, y1 + 2], -1).astype(np.float32)
    ids, sc, bb = postprocess(
        jnp.asarray(boxes), jnp.asarray(scores), nms_topk=-1, post_nms=n * c
    )
    assert int((np.asarray(ids) >= 0).sum()) == n * c
