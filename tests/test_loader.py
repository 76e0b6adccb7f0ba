"""Input-pipeline behaviors rebuilt in round 2: bounded in-flight prefetch,
per-batch transform views (no dataset mutation), randomized shape-bucket
schedule (reference RandomTransformDataLoader, train_yolov3.py:265-271),
and mixup-through-transform."""
import threading
import time

import numpy as np
import pytest

from videoyolo_tpu.data.base import DetectionDataset
from videoyolo_tpu.data.loader import DetectionLoader
from videoyolo_tpu.data.transforms import MixupDetection


class FakeDataset(DetectionDataset):
    """In-memory dataset: counts raw fetches, returns (img, label)."""

    def __init__(self, n=64, hw=48, transform=None):
        super().__init__(transform=transform)
        self._n = n
        self._hw = hw
        self.fetches = 0
        self._lock = threading.Lock()

    def __len__(self):
        return self._n

    def _load_image(self, idx):
        with self._lock:
            self.fetches += 1
        return np.full((self._hw, self._hw, 3), idx % 255, np.uint8)

    def _load_label(self, idx):
        return np.array([[1.0, 2.0, 10.0, 12.0, idx % 3, 0]], np.float64)

    @property
    def classes(self):
        return ["a", "b", "c"]

    @property
    def wn_classes(self):
        return ["a", "b", "c"]


class SizeTransform:
    """Resize-free stand-in: emits a (size, size, 3) image so tests can read
    which bucket produced a batch."""

    def __init__(self, w, h):
        self.w, self.h = w, h

    def __call__(self, img, label):
        out = np.zeros((self.h, self.w, 3), np.float32)
        return out, label.astype(np.float32)


def _shapes(loader):
    return [b["image"].shape[1] for b in loader]


def test_random_bucket_schedule_is_seeded_draw():
    sizes = [320, 352, 384, 416]
    ds = FakeDataset(n=16 * 4)
    mk = lambda seed: DetectionLoader(
        ds, batch_size=4, shuffle=True, seed=seed,
        transform_factory=SizeTransform, shape_sizes=sizes, shape_interval=2,
        num_workers=2,
    )
    s1, s2 = _shapes(mk(0)), _shapes(mk(0))
    assert s1 == s2  # deterministic per seed
    # every size comes from the bucket set, constant within each interval
    assert set(s1) <= set(sizes)
    for i in range(0, len(s1) - 1, 2):
        assert s1[i] == s1[i + 1]
    # randomized, not the round-1 deterministic cycle through the bucket list
    cycle = [sizes[(i // 2) % len(sizes)] for i in range(len(s1))]
    assert s1 != cycle
    # a random 16-draw from 4 buckets is overwhelmingly not constant
    assert len(set(s1)) > 1


def test_eval_loader_pins_first_bucket():
    ds = FakeDataset(n=16)
    loader = DetectionLoader(
        ds, batch_size=4, shuffle=False,
        transform_factory=SizeTransform, shape_sizes=[224, 320], num_workers=2,
    )
    assert set(_shapes(loader)) == {224}


def test_dataset_never_mutated_by_shape_buckets():
    ds = FakeDataset(n=32)
    sentinel = object()
    ds._transform = sentinel
    loader = DetectionLoader(
        ds, batch_size=4, shuffle=True, seed=0,
        transform_factory=SizeTransform, shape_sizes=[96, 128], shape_interval=1,
        num_workers=3,
    )
    for _ in loader:
        assert ds._transform is sentinel
    assert ds._transform is sentinel


def test_inflight_window_bounds_prefetch():
    """With workers=2, prefetch=1 at most 3 batches may be in flight: after
    the first batch is consumed and the consumer stalls, no more than
    (window + 1 consumed) batches of samples have been fetched."""
    bs, workers, prefetch = 4, 2, 1
    ds = FakeDataset(n=40 * bs)

    loader = DetectionLoader(
        ds, batch_size=bs, num_workers=workers, prefetch=prefetch,
        transform_factory=SizeTransform, shape_sizes=[64], shuffle=True, seed=0,
    )
    it = iter(loader)
    next(it)
    time.sleep(0.5)  # let any runaway submission drain
    # round-1 regression shape: submitting the whole epoch eagerly would have
    # fetched most of the 160 samples by now
    window = workers + prefetch
    assert ds.fetches <= (window + 2) * bs, ds.fetches
    it.close()


def test_worker_exception_propagates():
    class Boom(FakeDataset):
        def _load_image(self, idx):
            if idx == 9:
                raise RuntimeError("decode failed")
            return super()._load_image(idx)

    ds = Boom(n=16)
    ds._transform = SizeTransform(32, 32)
    loader = DetectionLoader(ds, batch_size=4, num_workers=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(loader)


def test_mixup_receives_transform_through_view():
    """--mixup path: the train transform must apply AFTER mixing (fixed in
    round 2 — previously the transform landed on the wrapper and was never
    applied, yielding raw variable-size images)."""
    ds = FakeDataset(n=16, hw=37)  # odd raw size: catches missing resize
    mix = MixupDetection(ds)
    np.random.seed(0)
    loader = DetectionLoader(
        mix, batch_size=4, shuffle=True, seed=0, mixup=True,
        transform_factory=SizeTransform, shape_sizes=[64], num_workers=2,
    )
    batches = list(loader)
    assert batches[0]["image"].shape == (4, 64, 64, 3)
    assert "gt_mix" in batches[0]
    assert mix._transform is None  # wrapper itself untouched
