import numpy as np
import jax.numpy as jnp

from videoyolo_tpu.ops import bbox


def test_pairwise_iou_matches_numpy_reference():
    rng = np.random.RandomState(0)
    a = rng.uniform(0, 300, size=(13, 2))
    a = np.concatenate([a, a + rng.uniform(1, 100, size=(13, 2))], axis=1)
    b = rng.uniform(0, 300, size=(7, 2))
    b = np.concatenate([b, b + rng.uniform(1, 100, size=(7, 2))], axis=1)
    ref = bbox.np_bbox_iou(a, b)
    got = np.asarray(bbox.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_pairwise_iou_no_overlap_is_zero():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[20.0, 20.0, 30.0, 30.0]])
    got = np.asarray(bbox.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    assert got[0, 0] == 0.0


def test_pairwise_iou_batched():
    rng = np.random.RandomState(1)
    a = rng.uniform(0, 100, size=(3, 5, 4)).astype(np.float32)
    a[..., 2:] += a[..., :2]
    b = rng.uniform(0, 100, size=(3, 4, 4)).astype(np.float32)
    b[..., 2:] += b[..., :2]
    got = np.asarray(bbox.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(3):
        ref = bbox.np_bbox_iou(a[i], b[i])
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-6)


def test_corner_center_roundtrip():
    rng = np.random.RandomState(2)
    boxes = rng.uniform(0, 100, size=(6, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    c = bbox.corner_to_center(jnp.asarray(boxes))
    back = np.asarray(bbox.center_to_corner(c))
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-5)


def test_xywh_xyxy_converters():
    xywh = np.array([[10.0, 20.0, 30.0, 40.0]])
    xyxy = bbox.bbox_xywh_to_xyxy(xywh)
    np.testing.assert_allclose(xyxy, [[10, 20, 10 + 29, 20 + 39]])
    back = bbox.bbox_xyxy_to_xywh(xyxy)
    np.testing.assert_allclose(back, xywh)


def test_clip():
    xyxy = np.array([[-5.0, -5.0, 700.0, 700.0]])
    clipped = bbox.bbox_clip_xyxy(xyxy, 416, 416)
    np.testing.assert_allclose(clipped, [[0, 0, 415, 415]])
