"""Native C++ data-loader core (videoyolo_tpu/native/loader.cc): build,
decode parity vs the cv2 path, failure handling, loader integration."""
import os

import numpy as np
import pytest

from videoyolo_tpu import native


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("jpegs")
    rs = np.random.RandomState(0)
    paths = []
    for i in range(4):
        img = rs.randint(0, 255, (200 + 11 * i, 300 + 7 * i, 3), np.uint8)
        p = str(d / f"im{i}.jpg")
        cv2.imwrite(p, img[:, :, ::-1])
        paths.append(p)
    return paths


needs_native = pytest.mark.skipif(
    not native.available(), reason="native loader could not build (no g++/libjpeg)"
)


@needs_native
def test_load_batch_matches_python_inference_path(jpegs):
    """The native inference resize follows imresize(interp=9) — INTER_AREA
    on downscale, INTER_CUBIC on upscale — so native and Python decode paths
    yield the same pixels (and cached predictions) on any host."""
    import cv2

    from videoyolo_tpu.data.transforms import imresize

    for out_hw in (96, 416):  # downscale (area) and upscale (cubic) paths
        batch, sizes = native.load_batch(jpegs, out_hw, out_hw)
        assert batch.shape == (4, out_hw, out_hw, 3) and batch.dtype == np.float32
        for i, p in enumerate(jpegs):
            ref = cv2.imread(p)[:, :, ::-1]
            assert tuple(sizes[i]) == ref.shape[:2]
            ref = imresize(ref, out_hw, out_hw, 9)
            ref = (ref.astype(np.float32) / 255.0 - native.MEAN) / native.STD
            # libjpeg-vs-cv2 IDCT LSBs + exact-fractional-box vs cv2's
            # quantized INTER_AREA: tight on mean, loose on worst pixel
            d = np.abs(ref - batch[i])
            assert d.mean() < 0.02, (out_hw, i, d.mean())
            assert d.max() < 0.6, (out_hw, i, d.max())


@needs_native
def test_load_batch_failure_flagged(jpegs):
    batch, sizes = native.load_batch([jpegs[0], "/nonexistent.jpg"], 64, 64)
    assert tuple(sizes[1]) == (-1, -1)
    assert np.abs(batch[1]).sum() == 0.0
    assert np.abs(batch[0]).sum() > 0.0


@needs_native
def test_loader_native_path(jpegs):
    from videoyolo_tpu.data.detectset import DetectSet
    from videoyolo_tpu.data.loader import DetectionLoader

    ds = DetectSet(list(jpegs))
    loader = DetectionLoader(ds, batch_size=2, native_decode=(64, 64))
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    assert set(batches[0]) == {"image", "idx"}
