"""Hand-computed golden tests for the YOLOv3 loss (gluoncv YOLOV3Loss
semantics, see ops/losses.py)."""
import numpy as np
import jax.numpy as jnp

from videoyolo_tpu.ops.losses import sigmoid_bce, weighted_l1, yolo3_loss


def np_bce(pred, label):
    return np.maximum(pred, 0) - pred * label + np.log1p(np.exp(-np.abs(pred)))


def test_sigmoid_bce_matches_formula():
    rng = np.random.RandomState(0)
    pred = rng.randn(2, 5, 1).astype(np.float32)
    label = (rng.rand(2, 5, 1) > 0.5).astype(np.float32)
    w = rng.rand(2, 5, 1).astype(np.float32)
    got = np.asarray(sigmoid_bce(jnp.asarray(pred), jnp.asarray(label), jnp.asarray(w)))
    ref = (np_bce(pred, label) * w).reshape(2, -1).sum(-1)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_weighted_l1():
    pred = jnp.asarray([[1.0, -2.0]])
    label = jnp.asarray([[0.0, 0.0]])
    w = jnp.asarray([[2.0, 1.0]])
    np.testing.assert_allclose(np.asarray(weighted_l1(pred, label, w)), [4.0])


def test_yolo3_loss_masks():
    """Ignored anchors (obj target -1) must contribute zero objectness loss;
    mixup ratio targets become hard 1 with the ratio as the mask weight."""
    B, N, C = 1, 4, 3
    objness = jnp.zeros((B, N, 1))
    centers = jnp.zeros((B, N, 2))
    scales = jnp.zeros((B, N, 2))
    cls = jnp.zeros((B, N, C))

    obj_t = jnp.asarray(np.array([[[1.0], [0.0], [-1.0], [0.5]]], np.float32))
    center_t = jnp.zeros((B, N, 2))
    scale_t = jnp.zeros((B, N, 2))
    # merged weights are nonzero only at matched (positive) anchors
    weight_t = jnp.asarray(np.array([[[1.0, 1.0], [0.0, 0.0], [0.0, 0.0], [1.0, 1.0]]], np.float32))
    class_t = jnp.zeros((B, N, C))
    class_mask = jnp.asarray(np.array([[[1.0] * C, [0.0] * C, [0.0] * C, [1.0] * C]], np.float32))

    losses = yolo3_loss(
        objness, centers, scales, cls, obj_t, center_t, scale_t, weight_t, class_t, class_mask
    )
    bce0 = np_bce(0.0, 1.0)  # = log(2)
    bce0_neg = np_bce(0.0, 0.0)  # = log(2)
    # obj: anchors -> masks [1, 1, 0, 0.5], targets [1, 0, -1(hard kept -1-> masked), 1]
    expected_obj = bce0 * 1 + bce0_neg * 1 + 0.0 + bce0 * 0.5
    np.testing.assert_allclose(np.asarray(losses["obj"])[0], expected_obj, rtol=1e-5)
    # center weights are weight_t * obj_t -> rows 0 (w=1) and 3 (w=0.5); target 0 pred 0 logit
    expected_center = (np_bce(0.0, 0.0) * 2) * 1 + (np_bce(0.0, 0.0) * 2) * 0.5
    np.testing.assert_allclose(np.asarray(losses["center"])[0], expected_center, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["scale"])[0], 0.0, atol=1e-6)
    # cls: class_mask * obj_t -> rows 0 (1) and 3 (0.5), C logits of 0 vs label 0
    expected_cls = bce0_neg * C * 1 + bce0_neg * C * 0.5
    np.testing.assert_allclose(np.asarray(losses["cls"])[0], expected_cls, rtol=1e-5)
