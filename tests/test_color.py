"""Color-matrix augmentation path (round 2): the photometric distortion +
normalization folded into one affine map, applied on host or on device —
must be pixel-exact vs the reference-ordered float pipeline
(video.py:68-158 + normalize)."""
import numpy as np
import random

from videoyolo_tpu.data.transforms import (
    MEAN,
    STD,
    apply_color_np,
    crop_resize_pad,
    imresize,
    random_color_distort,
    sample_color_matrix,
    to_normalized,
)


def _seed(s):
    np.random.seed(s)
    random.seed(s)


def test_color_matrix_matches_reference_pipeline():
    img = np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8)
    for seed in range(8):  # covers both orderings and gate combinations
        _seed(seed)
        ref = to_normalized(random_color_distort(img), MEAN, STD)
        _seed(seed)
        mat = sample_color_matrix(mean=MEAN, std=STD)
        out = apply_color_np(img, mat)
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_apply_color_device_matches_host():
    from videoyolo_tpu.ops.color import apply_color

    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (2, 16, 16, 3), np.uint8)
    mats = np.stack([sample_color_matrix() for _ in range(2)])
    dev = np.asarray(apply_color(img, mats))
    host = np.stack([apply_color_np(img[i], mats[i]) for i in range(2)])
    np.testing.assert_allclose(dev, host, atol=1e-4)
    # video volumes (B, K, H, W, 3)
    vol = rs.randint(0, 255, (2, 3, 8, 8, 3), np.uint8)
    dev = np.asarray(apply_color(vol, mats))
    host = np.stack([apply_color_np(vol[i], mats[i]) for i in range(2)])
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_crop_resize_pad_interior_matches_slice_resize():
    rs = np.random.RandomState(2)
    img = rs.randint(0, 255, (100, 120, 3), np.uint8)
    rect = (10, 20, 60, 50)  # fully inside
    out = crop_resize_pad(img, rect, 32, 24, interp=1, fill=[0, 0, 0])
    ref = imresize(img[20:70, 10:70], 32, 24, interp=1)
    np.testing.assert_array_equal(out, ref)


def test_crop_resize_pad_fill_outside():
    img = np.full((40, 40, 3), 200, np.uint8)
    # window half off the top-left corner: that quadrant must be fill
    out = crop_resize_pad(img, (-40, -40, 80, 80), 64, 64, interp=0, fill=[7, 8, 9])
    assert (out[:31, :31] == [7, 8, 9]).all()
    assert (out[33:, 33:] == 200).all()
    # fully outside -> all fill
    out = crop_resize_pad(img, (100, 100, 50, 50), 16, 16, interp=1, fill=[1, 2, 3])
    assert (out == [1, 2, 3]).all()


def test_train_transform_device_color_shapes():
    from videoyolo_tpu.data.transforms import (
        YOLO3DefaultTrainTransform,
        YOLO3VideoTrainTransform,
    )

    _seed(3)
    img = np.random.randint(0, 255, (120, 160, 3), np.uint8)
    label = np.array([[20.0, 30.0, 100.0, 90.0, 2.0, 0.0]])
    tf = YOLO3DefaultTrainTransform(96, 96, device_color=True)
    out, bbox, mat = tf(img, label.copy())
    assert out.shape == (96, 96, 3) and out.dtype == np.uint8
    assert mat.shape == (3, 4) and mat.dtype == np.float32
    if bbox.size:
        assert bbox[:, :4].min() >= -1e-3 and bbox[:, :4].max() <= 96 + 1e-3

    vol = np.random.randint(0, 255, (3, 120, 160, 3), np.uint8)
    tfv = YOLO3VideoTrainTransform(3, 96, 96, device_color=True)
    out, bbox, mat = tfv(vol, label.copy())
    assert out.shape == (3, 96, 96, 3) and mat.shape == (3, 4)


def test_collate_carries_color():
    from videoyolo_tpu.data.loader import collate_detection

    img = np.zeros((32, 32, 3), np.uint8)
    lab = np.ones((2, 6), np.float32)
    mat = sample_color_matrix()
    batch = collate_detection([(img, lab, mat), (img, lab, mat)], max_boxes=4)
    assert batch["color"].shape == (2, 3, 4)
    assert batch["image"].dtype == np.uint8  # stays uint8 until the device
    # without color matrices images still come out float32 (legacy contract)
    batch = collate_detection([(img, lab), (img, lab)], max_boxes=4)
    assert batch["image"].dtype == np.float32
