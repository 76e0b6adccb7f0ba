"""ImageNet-DET object detection dataset.

Capability parity with `/root/reference/datasets/imgnetdet.py`
(`ImageNetDetection` :16): ILSVRC DET XML (wnid class names, coords already
0-based), nonempty-split caching to `<split>_nonempty.txt` (:154-186),
allow_empty, coco-json export.
"""
from __future__ import annotations

import logging
import os
import warnings
import xml.etree.ElementTree as et
from typing import List

import numpy as np

from .base import DetectionDataset, load_names


class ImageNetDetection(DetectionDataset):
    name = "det"

    def __init__(
        self,
        root=os.path.join("datasets", "ImageNetDET", "ILSVRC"),
        splits=("train",),
        allow_empty: bool = False,
        transform=None,
        index_map=None,
        inference: bool = False,
    ):
        super().__init__(transform=transform, inference=inference)
        self.root = os.path.expanduser(root)
        self._splits = list(splits)
        self._allow_empty = allow_empty
        self._coco_path = os.path.join(self.root, "jsons", "_".join(self._splits) + ".json")
        self._annotations_path = os.path.join("{}", "Annotations", "DET", "{}", "{}.xml")
        self._image_path = os.path.join("{}", "Data", "DET", "{}", "{}.JPEG")
        # DET labels use wordnet ids as the class names in xml (imgnetdet.py:45)
        self.index_map = index_map or dict(zip(self.wn_classes, range(self.num_class)))
        self.samples = self._load_samples()
        self.sample_ids = sorted(self.samples.keys())
        for idx in range(len(self)):  # populate im_shapes
            self._load_label(idx)
        if not allow_empty:
            self.samples, self.sample_ids = self._remove_empties()

    @property
    def classes(self) -> List[str]:
        return load_names("imagenetdet")

    @property
    def wn_classes(self) -> List[str]:
        return load_names("imagenetdet_wn")

    def __len__(self):
        return len(self.sample_ids)

    def sample_path(self, idx):
        return self._image_path.format(*self.samples[self.sample_ids[idx]])

    def _coco_json_path(self):
        return self._coco_path

    def _load_samples(self):
        ids = []
        for split in self._splits:
            lf = os.path.join(self.root, "ImageSets", "DET", split + ".txt")
            with open(lf) as f:
                ids += [(self.root, split, line.split()[0]) for line in f if line.strip()]
        samples = {}
        for s in ids:
            assert s[-1] not in samples, f"Sample keys not unique: {s[-1]}"
            samples[s[-1]] = s
        return samples

    def _remove_empties(self):
        """Cache the nonempty split list (imgnetdet.py:146-186)."""
        not_empty_file = os.path.join(
            self.root, "ImageSets", "DET", self._splits[0] + "_nonempty.txt"
        )
        stats_file = os.path.join(
            self.root, "ImageSets", "DET", self._splits[0] + "_nonempty_stats.txt"
        )
        if os.path.exists(not_empty_file):
            logging.info("Loading splits from: %s", not_empty_file)
            with open(not_empty_file) as f:
                good_sample_ids = [line.rstrip() for line in f if line.strip()]
        else:
            good_sample_ids = []
            removed = 0
            n_boxes = 0
            for idx in range(len(self.sample_ids)):
                n = len([b for b in self._load_label(idx) if b[4] >= 0])
                if n < 1:
                    removed += 1
                else:
                    n_boxes += n
                    good_sample_ids.append(self.sample_ids[idx])
            msg = (
                f"Removed {removed} out of {len(self.sample_ids)} images, leaving "
                f"{len(good_sample_ids)} with {n_boxes} boxes over {len(self.classes)} classes.\n"
            )
            logging.info("Writing out new splits file: %s\n\n%s", not_empty_file, msg)
            os.makedirs(os.path.dirname(not_empty_file), exist_ok=True)
            with open(not_empty_file, "w") as f:
                f.writelines(sid + "\n" for sid in good_sample_ids)
            with open(stats_file, "w") as f:
                f.write(msg)
        good_samples = {sid: self.samples[sid] for sid in good_sample_ids}
        return good_samples, good_sample_ids

    def _load_label(self, idx):
        sample_id = self.sample_ids[idx]
        anno_path = self._annotations_path.format(*self.samples[sample_id])
        if not os.path.exists(anno_path):
            return np.array([[-1, -1, -1, -1, -1]], dtype=np.float64)
        root = et.parse(anno_path).getroot()
        size = root.find("size")
        width = float(size.find("width").text)
        height = float(size.find("height").text)
        if sample_id not in self._im_shapes:
            self._im_shapes[sample_id] = (width, height)
        label = []
        for obj in root.iter("object"):
            cls_name = obj.find("name").text.strip().lower()
            if cls_name not in self.index_map:
                continue
            cls_id = self.index_map[cls_name]
            xml_box = obj.find("bndbox")
            # DET xml coords are already 0-based (imgnetdet.py:216)
            xmin = float(xml_box.find("xmin").text)
            ymin = float(xml_box.find("ymin").text)
            xmax = float(xml_box.find("xmax").text)
            ymax = float(xml_box.find("ymax").text)
            xmin, ymin, xmax, ymax = self._validate_box(
                xmin, ymin, xmax, ymax, width, height, anno_path
            )
            label.append([xmin, ymin, xmax, ymax, cls_id])
        if self._allow_empty and len(label) < 1:
            label.append([-1, -1, -1, -1, -1])
        return np.array(label) if label else np.zeros((0, 5))

    @staticmethod
    def _validate_box(xmin, ymin, xmax, ymax, width, height, anno_path):
        if not 0 <= xmin < width or not 0 <= ymin < height or not xmin < xmax <= width or not ymin < ymax <= height:
            warnings.warn(
                f"box {xmin} {ymin} {xmax} {ymax} incompatible with img size "
                f"{width}x{height} in {anno_path}; clipping"
            )
            xmin = min(max(0, xmin), width - 1)
            ymin = min(max(0, ymin), height - 1)
            xmax = min(max(xmin + 1, xmax), width)
            ymax = min(max(ymin + 1, ymax), height)
        return xmin, ymin, xmax, ymax
