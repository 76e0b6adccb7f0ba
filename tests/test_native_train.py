"""Native augmented-decode train path (native/loader.cc vy_load_train_batch):
pixels must track the Python crop_resize_pad path, plans/labels must be
byte-identical (shared RNG), and failures must fall back to Python."""
import os

import numpy as np
import pytest

from videoyolo_tpu import native
from videoyolo_tpu.data.base import DetectionDataset
from videoyolo_tpu.data.loader import DetectionLoader
from videoyolo_tpu.data.transforms import (
    YOLO3DefaultTrainTransform,
    crop_resize_pad,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader unavailable (g++/libjpeg)"
)


@pytest.fixture(scope="module")
def jpeg(tmp_path_factory):
    import cv2

    p = str(tmp_path_factory.mktemp("imgs") / "a.jpg")
    rs = np.random.RandomState(0)
    cv2.imwrite(p, rs.randint(0, 255, (360, 480, 3), np.uint8))
    return p


def test_native_resample_matches_python(jpeg):
    import cv2

    img = cv2.cvtColor(cv2.imread(jpeg), cv2.COLOR_BGR2RGB)
    rs = np.random.RandomState(1)
    # (interp, python-ref interp, mean-abs tolerance): nearest/bilinear/cubic
    # are implemented to cv2 semantics; native area is an exact fractional
    # box while cv2 INTER_AREA quantizes (loose tol, downscale-only rects);
    # lanczos maps to cubic natively (checked against cubic, divergence from
    # cv2's LANCZOS4 is documented)
    tols = {0: (0, 0.01), 1: (1, 0.5), 2: (2, 0.5), 3: (3, 8.0), 4: (2, 0.5)}
    for trial in range(15):
        interp = trial % 5
        x0, y0 = rs.randint(-150, 400), rs.randint(-150, 300)
        if interp == 3:  # area: keep both sides on the downscale box path
            cw, ch = rs.randint(520, 800), rs.randint(520, 800)
        else:
            cw, ch = rs.randint(60, 800), rs.randint(60, 800)
        flip = bool(rs.randint(0, 2))
        ref_interp, _ = tols[interp]
        ref = crop_resize_pad(img, (x0, y0, cw, ch), 256, 256, ref_interp, [124, 117, 104])
        if flip:
            ref = ref[:, ::-1, :]
        out, ok = native.load_train_batch(
            [jpeg], np.array([[x0, y0, cw, ch]]), np.array([flip]),
            np.array([interp]), 256, 256, [124, 117, 104],
        )
        assert ok[0] == 1
        d = np.abs(out[0].astype(np.int32) - ref.astype(np.int32)).mean()
        assert d <= tols[interp][1], (trial, interp, d)


class _DS(DetectionDataset):
    native_train_ok = True

    def __init__(self, paths, wh):
        super().__init__()
        self.paths = paths
        self.wh = wh

    def __len__(self):
        return len(self.paths)

    def sample_path(self, i):
        return self.paths[i]

    def _load_label(self, i):
        return np.array([[40.0, 50.0, 200.0, 210.0, i % 3, 0]])

    def label_and_size(self, i):
        return self._load_label(i), self.wh

    @property
    def classes(self):
        return ["a", "b", "c"]

    @property
    def wn_classes(self):
        return ["a", "b", "c"]


def _run_epoch(ds, native_train, seed=5):
    import random

    np.random.seed(seed)
    random.seed(seed)  # expand geometry draws from python's random too
    loader = DetectionLoader(
        ds, batch_size=4, shuffle=True, seed=0, num_workers=1,
        transform_factory=lambda w, h: YOLO3DefaultTrainTransform(w, h, device_color=True),
        shape_sizes=[128], last_batch="discard", native_train=native_train,
    )
    return list(loader)


def test_loader_native_path_matches_python_path(jpeg):
    ds = _DS([jpeg] * 16, (480, 360))
    a = _run_epoch(ds, native_train=False)
    b = _run_epoch(ds, native_train=True)
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        # plans share one RNG stream: labels + color matrices identical
        np.testing.assert_array_equal(ba["gt_boxes"], bb["gt_boxes"])
        np.testing.assert_array_equal(ba["color"], bb["color"])
        assert bb["image"].dtype == np.uint8
        d = np.abs(
            ba["image"].astype(np.int32) - bb["image"].astype(np.int32)
        ).mean()
        assert d < 6.0, d  # pixel paths agree (area/lanczos within tolerance)


def test_missing_file_falls_back_and_raises(jpeg):
    ds = _DS([jpeg, "/nonexistent/zz.jpg"] * 4, (480, 360))
    with pytest.raises(Exception):
        _run_epoch(ds, native_train=True)


def test_mixup_forces_python_path(jpeg):
    """MixupDetection wraps a native-capable dataset (its __getattr__
    forwards native_train_ok), but mixup mixes image PAIRS before the
    augmentation — the native path must be bypassed so gt_mix is a real
    mix ratio, not the forwarded dataset's difficult column."""
    from videoyolo_tpu.data.transforms import MixupDetection

    import random

    np.random.seed(7)
    random.seed(7)
    ds = MixupDetection(_DS([jpeg] * 16, (480, 360)))
    loader = DetectionLoader(
        ds, batch_size=4, shuffle=True, seed=0, num_workers=1, mixup=True,
        transform_factory=lambda w, h: YOLO3DefaultTrainTransform(
            w, h, device_color=True
        ),
        shape_sizes=[128], last_batch="discard", native_train=True,
    )
    batches = list(loader)
    assert batches
    mixed = np.concatenate([b["gt_mix"] for b in batches], axis=0)
    valid = mixed[np.concatenate([b["gt_ids"] for b in batches], 0)[..., 0] >= 0]
    # real beta(1.5,1.5) ratios in (0,1); the difficult column would be
    # identically 0 for every box
    assert valid.size and (valid > 0).all() and (valid <= 1).all()
    assert np.unique(np.round(valid, 3)).size > 1
