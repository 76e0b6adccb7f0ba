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
def test_load_batch_matches_cv2(jpegs):
    import cv2

    batch, sizes = native.load_batch(jpegs, 96, 96)
    assert batch.shape == (4, 96, 96, 3) and batch.dtype == np.float32
    for i, p in enumerate(jpegs):
        ref = cv2.imread(p)[:, :, ::-1]
        assert tuple(sizes[i]) == ref.shape[:2]
        ref = cv2.resize(ref, (96, 96), interpolation=cv2.INTER_LINEAR)
        ref = (ref.astype(np.float32) / 255.0 - native.MEAN) / native.STD
        # libjpeg IDCT vs cv2 IDCT differ by a few LSBs per pixel
        assert np.abs(ref - batch[i]).max() < 0.05


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
