"""data/prefetch.device_prefetch: ordering, key filtering, transfer hook,
error propagation (the async-transfer equivalent of the reference's
split_and_load + MXNet async engine, train_yolov3.py:596-606)."""
import numpy as np
import pytest

from videoyolo_tpu.data.prefetch import device_prefetch


def _batches(n):
    for i in range(n):
        yield {"image": np.full((2, 4), i, np.float32), "label": i}


def test_preserves_order_and_values():
    out = list(device_prefetch(_batches(7), size=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert float(np.asarray(b["image"])[0, 0]) == i
        assert b["label"] == i  # passed through


def test_keys_filter_passthrough():
    import jax

    out = list(device_prefetch(_batches(3), size=1, keys=("image",)))
    assert isinstance(out[0]["image"], jax.Array)
    assert isinstance(out[0]["label"], int)


def test_transfer_hook():
    out = list(
        device_prefetch(_batches(4), size=2, transfer=lambda b: b["label"] * 10)
    )
    assert out == [0, 10, 20, 30]


def test_producer_error_propagates():
    def bad():
        yield {"image": np.zeros((1,)), "label": 0}
        raise RuntimeError("decode failed")

    it = device_prefetch(bad(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_early_break_stops_producer():
    """Breaking out of the consumer must terminate the producer thread and
    stop draining the source iterator (review finding: --max_epoch_time /
    max_do breaks leaked a blocked thread + staged batches per epoch)."""
    import threading
    import time

    consumed = []

    def src():
        for i in range(1000):
            consumed.append(i)
            yield {"image": np.full((1,), i, np.float32)}

    before = threading.active_count()
    it = device_prefetch(src(), size=2)
    next(it)
    it.close()  # what a `break` triggers via GC
    deadline = time.time() + 6
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    n = len(consumed)
    time.sleep(0.2)
    assert len(consumed) == n  # source no longer being drained
    assert n < 20  # bounded in-flight, not the whole epoch
