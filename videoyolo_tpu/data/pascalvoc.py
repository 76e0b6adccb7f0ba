"""Pascal VOC detection dataset.

Capability parity with `/root/reference/datasets/pascalvoc.py` (`VOCDetection`
:15): VOC 07/12 XML annotations, 0-based pixel coords (xml minus 1), label
validation/clipping, difficult flags, label preloading, stats, coco-json
export, optional pre-extracted features (`features_dir`,
pascalvoc.py:110-119).
"""
from __future__ import annotations

import os
import warnings
import xml.etree.ElementTree as et
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .base import DetectionDataset, load_names


class VOCDetection(DetectionDataset):
    """Pascal VOC object detection dataset (reference pascalvoc.py:15-306)."""

    name = "voc"

    def __init__(
        self,
        root=os.path.join("datasets", "PascalVOC", "VOCdevkit"),
        splits=((2007, "trainval"), (2012, "trainval")),
        transform=None,
        index_map=None,
        preload_label: bool = True,
        difficult: bool = True,
        inference: bool = False,
        features_dir: Optional[str] = None,
    ):
        super().__init__(transform=transform, inference=inference)
        self.root = os.path.expanduser(root)
        self._splits = list(splits)
        self._difficult = difficult
        self._features_dir = features_dir
        self._coco_path = os.path.join(
            self.root, "jsons", "_".join([str(s[0]) + s[1] for s in self._splits]) + ".json"
        )
        self._annotations_path = os.path.join("{}", "Annotations", "{}.xml")
        self._image_path = os.path.join("{}", "JPEGImages", "{}.jpg")
        self.index_map = index_map or dict(zip(self.classes, range(self.num_class)))
        self.samples = self._load_samples()
        self.sample_ids = sorted(self.samples.keys())
        self._labels = self._preload_labels() if preload_label else None

    @property
    def classes(self) -> List[str]:
        return load_names("pascalvoc")

    @property
    def wn_classes(self) -> List[str]:
        return load_names("pascalvoc_wn")

    def __len__(self):
        return len(self.sample_ids)

    def sample_path(self, idx):
        return self._image_path.format(*self.samples[self.sample_ids[idx]])

    def _coco_json_path(self):
        return self._coco_path

    def _load_samples(self):
        ids = []
        for year, name in self._splits:
            split_root = os.path.join(self.root, "VOC" + str(year))
            lf = os.path.join(split_root, "ImageSets", "Main", name + ".txt")
            with open(lf) as f:
                ids += [(split_root, line.strip()) for line in f if line.strip()]
        samples = {}
        for s in ids:
            assert s[-1] not in samples, f"Sample keys not unique: {s[-1]}"
            samples[s[-1]] = s
        return samples

    def __getitem__(self, idx):
        img = self._load_image(idx)
        label = self._labels[idx] if self._labels else self._load_label(idx)
        if self._features_dir is not None:
            file_id = self.samples[self.sample_ids[idx]][1]
            feats = [
                np.load(os.path.join(self._features_dir, f"{file_id}_F{i}.npy"))
                for i in (1, 2, 3)
            ]
            if self._transform is not None:  # NB transforms (box rescale)
                if self._inference:
                    return self._transform(img, *feats, label, idx)
                return self._transform(img, *feats, label)
            if self._inference:
                return (img, *feats, label, idx)
            return (img, *feats, label)
        return self._transformed(img, label, idx)

    # native augmented-decode path: labels are preloaded and the XML carries
    # the image size, so plans need no pixel decode (loader.py fast path)
    native_train_ok = True

    def label_and_size(self, idx):
        label = self._labels[idx] if self._labels else self._load_label(idx)
        size = self._im_shapes.get(self.sample_ids[idx])
        if self._features_dir is not None:
            return label, None  # feature samples don't go through image decode
        return label, (None if size is None else tuple(size))

    def _load_label(self, idx):
        sample_id = self.sample_ids[idx]
        anno_path = self._annotations_path.format(*self.samples[sample_id])
        if not os.path.exists(anno_path):
            return np.array([[-1, -1, -1, -1, -1, -1]], dtype=np.float64)
        root = et.parse(anno_path).getroot()
        size = root.find("size")
        width = float(size.find("width").text)
        height = float(size.find("height").text)
        if sample_id not in self._im_shapes:
            self._im_shapes[sample_id] = (width, height)
        label = []
        for obj in root.iter("object"):
            difficult = int(obj.find("difficult").text) if obj.find("difficult") is not None else 0
            cls_name = obj.find("name").text.strip().lower()
            if cls_name not in self.classes:
                continue
            cls_id = self.index_map[cls_name]
            xml_box = obj.find("bndbox")
            # VOC xml is 1-based; convert to 0-based (pascalvoc.py:180-184)
            xmin = float(xml_box.find("xmin").text) - 1
            ymin = float(xml_box.find("ymin").text) - 1
            xmax = float(xml_box.find("xmax").text) - 1
            ymax = float(xml_box.find("ymax").text) - 1
            xmin, ymin, xmax, ymax = self._validate_box(xmin, ymin, xmax, ymax, width, height, anno_path)
            label.append([xmin, ymin, xmax, ymax, cls_id, difficult if self._difficult else 0])
        if not label:
            label.append([-1, -1, -1, -1, -1, -1])
        return np.array(label)

    @staticmethod
    def _validate_box(xmin, ymin, xmax, ymax, width, height, anno_path):
        """Clip out-of-image boxes (pascalvoc.py:198-210)."""
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

    def _preload_labels(self):
        return [self._load_label(i) for i in range(len(self))]

    def stats(self):
        cls_boxes = []
        labels = self._labels or [self._load_label(i) for i in range(len(self))]
        n_boxes = [0] * len(self.classes)
        for label in labels:
            for box in label:
                if box[4] >= 0:
                    n_boxes[int(box[4])] += 1
        out = (
            f"{'Split:': <10} {', '.join(str(s[0]) + s[1] for s in self._splits)}\n"
            f"{'Images:': <10} {len(labels)}\n"
            f"{'Boxes:': <10} {sum(n_boxes)}\n"
            f"{'Classes:': <10} {len(self.classes)}\n"
        ) + "-" * 35 + "\n"
        for i, n in enumerate(n_boxes):
            out += f"{i: <3} {self.wn_classes[i]: <10} {self.classes[i]: <15} {n}\n"
            cls_boxes.append([i, self.wn_classes[i], self.classes[i], n])
        out += "-" * 35 + "\n"
        return out, cls_boxes
