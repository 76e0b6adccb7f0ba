"""Input pipeline: threaded prefetch + fixed-shape batching + device transfer.

Capability parity with the reference's DataLoader usage
(`/root/reference/train_yolov3.py:240-286`):
  * multiprocess-worker prefetch -> thread-pool prefetch with a bounded
    ready-batch queue (double buffering toward the device);
  * `batchify.Tuple(Stack, Pad(-1))` -> fixed-size -1 padding of labels
    (static shapes so jit never recompiles on box count);
  * `RandomTransformDataLoader` random-shape-every-10-batches
    (train_yolov3.py:265-271) -> `shape_sizes`/`shape_interval`: the loader
    cycles data shapes from a fixed bucket set, so each bucket compiles once
    and is cached thereafter (TPU-friendly multi-scale training);
  * `last_batch='discard'` semantics for the train loader.

Batches are dicts of numpy arrays; `shard_batch` (parallel/mesh.py) moves
them to the mesh with the batch axis sharded.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np

__all__ = ["pad_labels", "collate_detection", "DetectionLoader"]


def pad_labels(labels: Sequence[np.ndarray], max_boxes: int) -> np.ndarray:
    """Stack variable-length (N_i, D) labels into (B, max_boxes, D), -1 pad."""
    d = max((l.shape[1] for l in labels if l.size), default=6)
    out = np.full((len(labels), max_boxes, d), -1.0, np.float32)
    for i, l in enumerate(labels):
        n = min(len(l), max_boxes)
        if n:
            out[i, :n, : l.shape[1]] = l[:n]
    return out


def collate_detection(
    samples, max_boxes: int = 56, mixup: bool = False, multihot: int = 0
) -> Dict[str, np.ndarray]:
    """Collate a list of (img, label[, idx]) into a fixed-shape batch dict.

    `multihot=C` marks class-tree labels [l,t,r,b, c_0..c_{C-1}(,mix)]
    (combined.py:186-202): gt_ids becomes the (B, M, C) multi-hot block.
    mult_out samples carry a LIST of per-frame labels -> (B, T, M, D)."""
    imgs = np.stack([s[0] for s in samples]).astype(np.float32)
    if isinstance(samples[0][1], (list, tuple)):
        labels = np.stack(
            [pad_labels([np.atleast_2d(l) for l in s[1]], max_boxes) for s in samples]
        )
    else:
        labels = pad_labels([np.atleast_2d(s[1]) for s in samples], max_boxes)
    batch = {
        "image": imgs,
        "gt_boxes": labels[..., :4],
        "gt_ids": labels[..., 4 : 4 + multihot] if multihot else labels[..., 4:5],
        "label": labels,
    }
    if mixup:
        batch["gt_mix"] = labels[..., -1:]
    if len(samples[0]) > 2:
        batch["idx"] = np.asarray([s[2] for s in samples], np.int64)
    return batch


def collate_features(samples, max_boxes: int = 56, mixup: bool = False) -> Dict[str, np.ndarray]:
    """Collate no-backbone samples (f1, f2, f3, label[, idx]) into a batch
    with a 'features' tuple instead of 'image'."""
    f1 = np.stack([s[0] for s in samples]).astype(np.float32)
    f2 = np.stack([s[1] for s in samples]).astype(np.float32)
    f3 = np.stack([s[2] for s in samples]).astype(np.float32)
    labels = pad_labels([np.atleast_2d(s[3]) for s in samples], max_boxes)
    batch = {
        "features": (f1, f2, f3),
        "gt_boxes": labels[..., :4],
        "gt_ids": labels[..., 4:5],
        "label": labels,
    }
    if mixup:
        batch["gt_mix"] = labels[..., -1:]
    if len(samples[0]) > 4:
        batch["idx"] = np.asarray([s[4] for s in samples], np.int64)
    return batch


class DetectionLoader:
    """Iterable over fixed-shape batches with background prefetch.

    transform_factory: (width, height) -> transform, installed on the dataset
    per shape bucket (the dataset must accept `._transform` assignment, which
    all DetectionDataset subclasses do).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        last_batch: str = "keep",
        max_boxes: int = 56,
        num_workers: int = 4,
        prefetch: int = 2,
        mixup: bool = False,
        seed: Optional[int] = None,
        transform_factory: Optional[Callable[[int, int], Callable]] = None,
        shape_sizes: Optional[Sequence[int]] = None,
        shape_interval: int = 10,
        collate: Optional[Callable] = None,
        native_decode: Optional[Sequence[int]] = None,
        multihot: int = 0,
    ):
        """`native_decode=(h, w)` routes whole batches through the C++
        decode+resize+normalize core (native/loader.cc) instead of per-sample
        Python transforms — the fast path for plain-image inference/extract
        sweeps (labels still come from the dataset)."""
        assert last_batch in ("keep", "discard")
        self._dataset = dataset
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._last_batch = last_batch
        self._max_boxes = max_boxes
        self._num_workers = max(1, num_workers)
        self._prefetch = prefetch
        self._mixup = mixup
        self._rng = np.random.RandomState(seed)
        self._transform_factory = transform_factory
        self._shape_sizes = list(shape_sizes) if shape_sizes else None
        self._shape_interval = shape_interval
        self._collate = collate or (
            lambda samples: collate_detection(
                samples, self._max_boxes, self._mixup, multihot
            )
        )
        self._native_hw = tuple(native_decode) if native_decode else None
        if self._native_hw is not None:
            from .. import native

            if not native.available():
                self._native_hw = None  # degrade to the Python path

    def __len__(self):
        n = len(self._dataset)
        if self._last_batch == "discard":
            return n // self._batch_size
        return (n + self._batch_size - 1) // self._batch_size

    def _batch_indices(self):
        idxs = np.arange(len(self._dataset))
        if self._shuffle:
            self._rng.shuffle(idxs)
        batches = []
        for i in range(0, len(idxs), self._batch_size):
            chunk = idxs[i : i + self._batch_size]
            if len(chunk) < self._batch_size and self._last_batch == "discard":
                continue
            batches.append(chunk)
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batch_indices()
        out_q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        sentinel = object()

        def make_batch(bi, chunk):
            if self._native_hw is not None:
                from .. import native

                h, w = self._native_hw
                paths = [self._dataset.sample_path(int(j)) for j in chunk]
                imgs, _ = native.load_batch(paths, h, w)
                return {
                    "image": imgs,
                    "idx": np.asarray([int(j) for j in chunk], np.int64),
                }
            if self._transform_factory is not None and self._shape_sizes:
                size = self._shape_sizes[
                    (bi // self._shape_interval) % len(self._shape_sizes)
                ] if self._shuffle else self._shape_sizes[0]
                # a fresh transform per bucket keeps datasets stateless
                self._dataset._transform = self._transform_factory(size, size)
            samples = [self._dataset[int(j)] for j in chunk]
            return self._collate(samples)

        def producer():
            try:
                if self._num_workers > 1 and self._shape_sizes is None:
                    with ThreadPoolExecutor(self._num_workers) as pool:
                        futures = [
                            pool.submit(make_batch, bi, chunk)
                            for bi, chunk in enumerate(batches)
                        ]
                        for f in futures:
                            out_q.put(f.result())
                else:
                    for bi, chunk in enumerate(batches):
                        out_q.put(make_batch(bi, chunk))
            except Exception as e:  # surfaced by consumer
                out_q.put(e)
            finally:
                out_q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            if isinstance(item, Exception):
                raise item
            yield item
