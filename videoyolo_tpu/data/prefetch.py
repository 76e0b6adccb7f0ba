"""Async host->device batch prefetching.

The loader yields numpy batches; feeding them straight into a jitted step
serialises the host->device copy with the device step (and with the host
pipeline itself).  `device_prefetch` wraps any batch iterator and keeps up
to `size` batches in flight on the device: transfers are issued with
`jax.device_put` from a background thread while the device crunches the
previous step — the equivalent of the double-buffering the reference got
implicitly from `split_and_load` + MXNet's async engine
(`/root/reference/train_yolov3.py:596-606`).

Works with plain single-device placement (default) or an explicit
`jax.sharding.Sharding` / per-key sharding dict (multi-chip: pass the
batch-axis sharding from parallel/mesh.py).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

__all__ = ["device_prefetch"]

_END = object()


def device_prefetch(
    iterator,
    size: int = 2,
    sharding: Optional[Any] = None,
    keys: Optional[tuple] = None,
    transfer=None,
) -> Iterator[Any]:
    """Yield device-resident batches, keeping `size` transfers in flight.

    iterator: yields dict batches of numpy arrays (extra keys preserved but
      only `keys` — default: all — are transferred; others pass through).
    sharding: optional jax sharding (or {key: sharding}) for device_put.
    transfer: optional callable(batch) -> staged value replacing the default
      per-key device_put (e.g. parallel/mesh.shard_batch for a mesh).
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []

    def put(batch):
        if transfer is not None:
            return transfer(batch)
        out = {}
        for k, v in batch.items():
            if keys is not None and k not in keys:
                out[k] = v
                continue
            s = sharding.get(k) if isinstance(sharding, dict) else sharding
            out[k] = jax.device_put(v, s) if s is not None else jax.device_put(v)
        return out

    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that aborts when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not _put(put(batch)):
                    return  # consumer closed early — drop in-flight work
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer broke out early (or errored): unblock + stop the producer
        # so staged device batches and the wrapped iterator are released
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5.0)
