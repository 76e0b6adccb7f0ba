"""Dataset base protocol.

Capability parity with the reference's dataset contract (SURVEY.md §2.5,
derived from gluoncv VisionDataset subclasses in `/root/reference/datasets/`):

  __getitem__ -> (img, label[, idx])      label rows
                 [xmin, ymin, xmax, ymax, cls_id, (difficult|trk_id)]
  .classes / .wn_classes                  read from packaged names assets
  .sample_path(idx)
  .stats() -> (str, per-class box counts)
  .build_coco_json() -> path              for COCO-metric eval on any dataset

Images are returned as HWC uint8 RGB numpy arrays (the TPU pipeline is
channel-last end to end).
"""
from __future__ import annotations

import json
import functools
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

ASSETS_DIR = os.path.join(os.path.dirname(__file__), "assets")


@functools.lru_cache(maxsize=None)
def _load_names_cached(path: str) -> tuple:
    with open(path) as f:
        return tuple(line.strip() for line in f if line.strip())


def load_names(name: str) -> List[str]:
    """Load a class list from the packaged names assets
    (mirrors the reference's datasets/names/*.names files).  Cached: the
    `classes`/`class_ids` dataset properties call this per label row, and
    VID/YTBB preload every label at init — uncached that is tens of
    thousands of redundant file reads."""
    path = os.path.join(ASSETS_DIR, "names", name if name.endswith(".names") else name + ".names")
    return list(_load_names_cached(path))


def read_image(path: str) -> np.ndarray:
    """Read an image file to HWC uint8 RGB (the reference's mx.image.imread)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    # cvtColor, not img[:, :, ::-1].copy(): the negative-stride copy costs
    # ~2 ms per 500px image, the SIMD conversion is ~free
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class DetectionDataset:
    """Base class implementing the shared protocol surface."""

    name = "base"
    # Datasets that can serve (label, image size) WITHOUT decoding pixels may
    # opt into the native augmented-decode train path (data/loader.py) by
    # setting this True and keeping label_and_size consistent with what
    # __getitem__ hands the transform.
    native_train_ok = False

    def __init__(self, transform=None, inference: bool = False):
        self._transform = transform
        self._inference = inference
        self._im_shapes = {}

    # --- required overrides -------------------------------------------------
    def __len__(self) -> int:
        raise NotImplementedError

    def sample_path(self, idx: int) -> str:
        raise NotImplementedError

    def _load_label(self, idx: int) -> np.ndarray:
        raise NotImplementedError

    @property
    def classes(self) -> Sequence[str]:
        raise NotImplementedError

    @property
    def wn_classes(self) -> Sequence[str]:
        raise NotImplementedError

    # --- shared implementation ----------------------------------------------
    @property
    def num_class(self) -> int:
        return len(self.classes)

    def _load_image(self, idx: int) -> np.ndarray:
        return read_image(self.sample_path(idx))

    def __getitem__(self, idx: int):
        img = self._load_image(idx)
        label = self._load_label(idx)
        return self._transformed(img, label, idx)

    def _transformed(self, img, label, idx):
        """Apply self._transform and build the sample tuple.  device_color
        train transforms (data/transforms.py) emit (img, label, color_matrix)
        triples — those pass through intact for the loader's collate."""
        if self._transform is not None:
            out = self._transform(img, label)
            if len(out) == 3 and not self._inference:
                return out
            img, label = out[0], out[1]
        if self._inference:
            return img, label, idx
        return img, label

    def __str__(self):
        return "\n\n" + self.__class__.__name__ + "\n" + self.stats()[0] + "\n"

    def stats(self) -> Tuple[str, list]:
        """Per-class box counts table (pascalvoc.py:236-262 equivalent)."""
        cls_boxes = []
        n_boxes = [0] * len(self.classes)
        for idx in range(len(self)):
            for box in self._load_label(idx):
                if box[4] >= 0:
                    n_boxes[int(box[4])] += 1
        out = (
            f"{'Images:': <10} {len(self)}\n"
            f"{'Boxes:': <10} {sum(n_boxes)}\n"
            f"{'Classes:': <10} {len(self.classes)}\n"
        )
        out += "-" * 35 + "\n"
        for i, n in enumerate(n_boxes):
            out += f"{i: <3} {self.wn_classes[i]: <10} {self.classes[i]: <15} {n}\n"
            cls_boxes.append([i, self.wn_classes[i], self.classes[i], n])
        out += "-" * 35 + "\n"
        return out, cls_boxes

    def image_size(self, sample_id):
        return self._im_shapes[sample_id]

    def label_and_size(self, idx):
        """(label-as-the-transform-sees-it, (w, h) or None) without decoding
        the image — the native train path plans augmentations from this."""
        label = self._load_label(idx)
        sid = self.sample_ids[idx] if hasattr(self, "sample_ids") else idx
        size = self._im_shapes.get(sid)
        return label, (None if size is None else tuple(size))

    def _coco_json_path(self) -> str:
        raise NotImplementedError

    def build_coco_json(self) -> str:
        """Write a COCO-style gt json for this dataset (pascalvoc.py:264-306)."""
        path = self._coco_json_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        categories = [
            {"id": ci, "name": cls, "wnid": wn}
            for ci, (cls, wn) in enumerate(zip(self.classes, self.wn_classes))
        ]
        images, annotations, done = [], [], set()
        for idx in range(len(self)):
            sid = self.sample_ids[idx] if hasattr(self, "sample_ids") else idx
            if sid not in done:
                done.add(sid)
                w, h = self._im_shapes.get(sid, (0, 0))
                images.append(
                    {"file_name": self.sample_path(idx), "width": int(w), "height": int(h), "id": sid}
                )
            for box in self._load_label(idx):
                if box[4] < 0:
                    continue
                xywh = [int(box[0]), int(box[1]), int(box[2]) - int(box[0]), int(box[3]) - int(box[1])]
                annotations.append(
                    {
                        "image_id": sid,
                        "id": len(annotations),
                        "bbox": xywh,
                        "area": int(xywh[2] * xywh[3]),
                        "category_id": int(box[4]),
                        "iscrowd": 0,
                    }
                )
        with open(path, "w") as f:
            json.dump({"images": images, "annotations": annotations, "categories": categories}, f)
        return path
