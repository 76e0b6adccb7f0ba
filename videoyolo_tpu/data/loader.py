"""Input pipeline: parallel prefetch + fixed-shape batching + device transfer.

Capability parity with the reference's DataLoader usage
(`/root/reference/train_yolov3.py:240-286`):
  * multiprocess-worker prefetch -> thread-pool prefetch with a BOUNDED
    in-flight window (at most num_workers + prefetch batches exist at any
    moment, so host RAM stays O(prefetch) regardless of dataset size);
    the heavy per-image work (JPEG decode, cv2 resize/warp) releases the
    GIL, so threads scale with cores without process-pool pickling;
  * `batchify.Tuple(Stack, Pad(-1))` -> fixed-size -1 padding of labels
    (static shapes so jit never recompiles on box count);
  * `RandomTransformDataLoader` picking a RANDOM transform every `interval`
    batches (train_yolov3.py:265-271) -> `shape_sizes`/`shape_interval`:
    a seeded random draw from the fixed bucket set every interval, so each
    bucket compiles once and is cached (TPU-friendly multi-scale training);
    non-shuffled (eval) loaders pin the first bucket;
  * `last_batch='discard'` semantics for the train loader.

Workers never mutate the shared dataset: each batch runs against a shallow
per-batch view carrying its own transform instance, so concurrent batches
with different shape buckets are race-free.

Batches are dicts of numpy arrays; `shard_batch` (parallel/mesh.py) moves
them to the mesh with the batch axis sharded.
"""
from __future__ import annotations

import copy
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["pad_labels", "collate_detection", "DetectionLoader"]


_truncation_warned = False


def pad_labels(labels: Sequence[np.ndarray], max_boxes: int) -> np.ndarray:
    """Stack variable-length (N_i, D) labels into (B, max_boxes, D), -1 pad.

    The fixed row count is the jit shape contract (the reference pads
    dynamically to the batch max, Pad(-1)); images with more than
    `max_boxes` objects are truncated with a one-time warning — raise the
    loader's max_boxes (train CLI: --max_boxes) for crowded datasets."""
    global _truncation_warned
    d = max((l.shape[1] for l in labels if l.size), default=6)
    out = np.full((len(labels), max_boxes, d), -1.0, np.float32)
    for i, l in enumerate(labels):
        n = min(len(l), max_boxes)
        if len(l) > max_boxes and not _truncation_warned:
            _truncation_warned = True
            import warnings

            warnings.warn(
                f"ground-truth labels truncated: an image carries {len(l)} "
                f"boxes > max_boxes={max_boxes}; excess boxes are dropped "
                "from targets/eval — raise max_boxes (--max_boxes) to fit "
                "the dataset's most crowded image",
                stacklevel=2,
            )
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
    has_color = (
        len(samples[0]) > 2 and getattr(samples[0][2], "shape", None) == (3, 4)
    )
    imgs = np.stack([s[0] for s in samples])
    if not has_color:
        imgs = imgs.astype(np.float32)
    # device_color batches stay uint8: 4x less host->device traffic, the
    # color matrix normalizes on device (ops/color.py)
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
    if has_color:
        batch["color"] = np.stack([s[2] for s in samples])
    elif len(samples[0]) > 2:
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
    """Iterable over fixed-shape batches with bounded background prefetch.

    transform_factory: (width, height) -> transform.  Each interval group of
    batches gets a fresh transform instance, applied through a shallow
    per-batch dataset view (`copy.copy` + `_transform` override) — the shared
    dataset object is never mutated.
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
        native_train: bool = True,
        sampler=None,
        num_samples: Optional[int] = None,
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
        # mixup vstacks two images' labels into one row set — double the
        # fixed pad so the mixed pair fits what either image alone would
        self._max_boxes = max_boxes * 2 if mixup else max_boxes
        self._num_workers = max(1, num_workers)
        self._prefetch = max(1, prefetch)
        self._mixup = mixup
        self._rng = np.random.RandomState(seed)
        self._transform_factory = transform_factory
        self._shape_sizes = list(shape_sizes) if shape_sizes else None
        self._shape_interval = max(1, shape_interval)
        self._collate = collate or (
            lambda samples: collate_detection(
                samples, self._max_boxes, self._mixup, multihot
            )
        )
        # multi-host data sharding (parallel/multihost.py): `sampler(epoch)`
        # supplies this process's (already permuted) dataset indices per
        # epoch; `num_samples` sets the per-process epoch length for __len__
        self._sampler = sampler
        self._num_samples = num_samples
        self._epoch = 0
        self._native_train = native_train
        self._native_hw = tuple(native_decode) if native_decode else None
        if self._native_hw is not None:
            from .. import native

            if not native.available():
                self._native_hw = None  # degrade to the Python path

    def __len__(self):
        n = self._num_samples if self._num_samples is not None else len(self._dataset)
        if self._last_batch == "discard":
            return n // self._batch_size
        return (n + self._batch_size - 1) // self._batch_size

    def _batch_indices(self):
        if self._sampler is not None:
            idxs = np.asarray(self._sampler(self._epoch))
            self._epoch += 1
        else:
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

    def _plan(self) -> List[Tuple[np.ndarray, Optional[Callable]]]:
        """One epoch's (index_chunk, transform) pairs.

        A random bucket is drawn every `shape_interval` batches
        (RandomTransformDataLoader semantics, reference
        train_yolov3.py:265-271); eval/non-shuffle loaders pin bucket 0.
        """
        plan = []
        tf = None
        for bi, chunk in enumerate(self._batch_indices()):
            if self._transform_factory is not None and self._shape_sizes:
                if tf is None or bi % self._shape_interval == 0:
                    if self._shuffle and len(self._shape_sizes) > 1:
                        size = int(self._rng.choice(self._shape_sizes))
                    else:
                        size = int(self._shape_sizes[0])
                    tf = self._transform_factory(size, size)
            plan.append((chunk, tf))
        return plan

    def _make_batch(self, chunk, transform):
        if self._native_hw is not None:
            from .. import native

            h, w = self._native_hw
            paths = [self._dataset.sample_path(int(j)) for j in chunk]
            imgs, sizes = native.load_batch(paths, h, w)
            if (sizes < 0).any():  # decode failure: raise like the Python
                bad = [p for p, s in zip(paths, sizes) if s[0] < 0]
                raise FileNotFoundError(
                    f"native decode failed for {len(bad)} image(s), e.g. {bad[0]}"
                )
            return {
                "image": imgs,
                "idx": np.asarray([int(j) for j in chunk], np.int64),
            }
        if (
            self._native_train
            # mixup mixes image PAIRS before augmentation (MixupDetection
            # wraps the dataset, whose __getattr__ would happily forward
            # native_train_ok/label_and_size from the wrapped dataset and
            # silently skip the mixing — and the collate would then read
            # the difficult column as the mix ratio): python path only
            and not self._mixup
            and transform is not None
            and hasattr(transform, "plan")
            and getattr(transform, "_device_color", False)
            and getattr(self._dataset, "native_train_ok", False)
        ):
            batch = self._native_train_batch(chunk, transform)
            if batch is not None:
                return batch
        ds = self._dataset
        if transform is not None:
            # shallow per-batch view: heavy state (label caches, index maps)
            # is shared, only the transform slot differs
            ds = copy.copy(ds)
            ds._transform = transform
        samples = [ds[int(j)] for j in chunk]
        return self._collate(samples)

    def _native_train_batch(self, chunk, transform):
        """C++ augmented-decode path (native/loader.cc vy_load_train_batch):
        plans are sampled in Python from labels + cached image sizes, pixels
        go decode->crop->resize->flip in native threads, uint8 out.  Returns
        None to fall back to the Python path (library missing, size unknown,
        or a decode failure that the Python path should report properly)."""
        from .. import native

        if not native.available():
            return None
        paths, rects, flips, interps, bboxes, mats = [], [], [], [], [], []
        for j in chunk:
            label, size = self._dataset.label_and_size(int(j))
            if size is None:
                return None
            w, h = size
            bbox, rect, flip, interp, mat = transform.plan(label, int(w), int(h))
            paths.append(self._dataset.sample_path(int(j)))
            rects.append(rect)
            flips.append(flip)
            interps.append(interp)
            bboxes.append(bbox.astype(np.float32))
            mats.append(mat)
        out_w, out_h = transform.out_wh
        imgs, ok = native.load_train_batch(
            paths,
            np.asarray(rects, np.int32),
            np.asarray(flips, np.uint8),
            np.asarray(interps, np.uint8),
            out_h, out_w,
            transform.fill,
            threads=self._num_workers,
        )
        if not ok.all():
            return None  # let the Python path surface the unreadable file
        samples = [(imgs[i], bboxes[i], mats[i]) for i in range(len(chunk))]
        return self._collate(samples)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        plan = iter(self._plan())
        if self._num_workers <= 1:
            for chunk, tf in plan:
                yield self._make_batch(chunk, tf)
            return
        # Bounded in-flight window, results yielded in submission order.
        # Unlike submitting the whole epoch eagerly, completed-but-unconsumed
        # batches can never exceed the window, so host memory stays bounded.
        max_inflight = self._num_workers + self._prefetch
        with ThreadPoolExecutor(self._num_workers) as pool:
            inflight: deque = deque()
            for item in plan:
                inflight.append(pool.submit(self._make_batch, *item))
                if len(inflight) >= max_inflight:
                    break
            while inflight:
                batch = inflight.popleft().result()  # re-raises worker errors
                nxt = next(plan, None)
                if nxt is not None:
                    inflight.append(pool.submit(self._make_batch, *nxt))
                yield batch
