"""MS COCO detection dataset.

Capability parity with `/root/reference/datasets/mscoco.py` (`COCODetection`
:14): json<->contiguous id maps (:173-178), crowd/min-area filtering
(:199-227), allow_empty, stats.  Uses the self-contained `CocoIndex` (no
pycocotools dependency).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .base import DetectionDataset, load_names
from .cocojson import CocoIndex
from ..ops.bbox import bbox_clip_xyxy, bbox_xywh_to_xyxy


class COCODetection(DetectionDataset):
    name = "coco"

    def __init__(
        self,
        root=os.path.join("datasets", "MSCoco"),
        splits=("instances_train2017",),
        transform=None,
        min_object_area: int = 0,
        allow_empty: bool = False,
        use_crowd: bool = True,
        inference: bool = False,
    ):
        super().__init__(transform=transform, inference=inference)
        self.root = os.path.expanduser(root)
        self._splits = list(splits)
        self._min_object_area = min_object_area
        self._allow_empty = allow_empty
        self._use_crowd = use_crowd
        self.index_map = dict(zip(self.classes, range(self.num_class)))
        self.json_id_to_contiguous = None
        self.contiguous_id_to_json = None
        self._coco: List[CocoIndex] = []
        self.sample_to_img_id = {}  # contiguous sample id -> original json image id
        self.samples, self._labels = self._load_jsons()
        self.sample_ids = list(self.samples.keys())

    @property
    def coco(self) -> CocoIndex:
        if not self._coco:
            raise ValueError("No coco objects found, dataset not initialized.")
        if len(self._coco) > 1:
            raise NotImplementedError("evaluate one json at a time")
        return self._coco[0]

    @property
    def annotation_dir(self):
        return "annotations"

    @property
    def classes(self) -> List[str]:
        return load_names("coco")

    @property
    def wn_classes(self) -> List[str]:
        return load_names("coco_wn")

    def __len__(self):
        return len(self.sample_ids)

    def sample_path(self, idx):
        return self.samples[self.sample_ids[idx]]

    def _parse_image_path(self, entry) -> str:
        """coco_url 'train2017/xxx.jpg' -> root/images/train2017/xxx.jpg
        (mscoco.py:110-119); falls back to file_name."""
        if "coco_url" in entry:
            dirname, filename = entry["coco_url"].split("/")[-2:]
        else:
            dirname = self._splits[0].split("_")[-1]
            filename = entry["file_name"]
        return os.path.join(self.root, "images", dirname, filename)

    def _load_jsons(self):
        samples, labels = {}, {}
        for split in self._splits:
            anno = os.path.join(self.root, self.annotation_dir, split) + ".json"
            coco = CocoIndex(anno)
            self._coco.append(coco)
            classes = coco.cat_names()
            if classes != self.classes:
                raise ValueError("Incompatible category names with COCO")
            cat_ids = coco.get_cat_ids()
            json_id_to_contiguous = {v: k for k, v in enumerate(cat_ids)}
            if self.json_id_to_contiguous is None:
                self.json_id_to_contiguous = json_id_to_contiguous
                self.contiguous_id_to_json = {v: k for k, v in json_id_to_contiguous.items()}
            else:
                assert self.json_id_to_contiguous == json_id_to_contiguous
            for img_id in sorted(coco.get_img_ids()):
                entry = coco.imgs[img_id]
                abs_path = self._parse_image_path(entry)
                label = self._check_load_bbox(coco, entry)
                if not label:
                    continue
                sample_id = len(samples)
                samples[sample_id] = abs_path
                labels[sample_id] = label
                self.sample_to_img_id[sample_id] = img_id
                self._im_shapes[sample_id] = (entry["width"], entry["height"])
        return samples, labels

    def _check_load_bbox(self, coco: CocoIndex, entry):
        """Filter/convert boxes (mscoco.py:199-227)."""
        width, height = entry["width"], entry["height"]
        valid_objs = []
        for obj in coco.anns_for_img(entry["id"]):
            if obj["area"] < self._min_object_area:
                continue
            if obj.get("ignore", 0) == 1:
                continue
            if not self._use_crowd and obj.get("iscrowd", 0):
                continue
            xmin, ymin, xmax, ymax = bbox_clip_xyxy(
                bbox_xywh_to_xyxy(list(obj["bbox"])), width, height
            )
            if obj["area"] > 0 and xmax > xmin and ymax > ymin:
                cid = self.json_id_to_contiguous[obj["category_id"]]
                valid_objs.append([xmin, ymin, xmax, ymax, cid])
        if not valid_objs and self._allow_empty:
            valid_objs.append([-1, -1, -1, -1, -1])
        return valid_objs

    def _load_label(self, idx):
        return np.array(self._labels[self.sample_ids[idx]], dtype=np.float64)

    def image_size(self, sample_id):
        return self._im_shapes[sample_id]

    def __getitem__(self, idx):
        img = self._load_image(idx)
        label = self._load_label(idx)
        return self._transformed(img, label, idx)

    def stats(self):
        cls_boxes = []
        n_boxes = [0] * len(self.classes)
        for label in self._labels.values():
            for box in label:
                if box[4] >= 0:
                    n_boxes[int(box[4])] += 1
        out = (
            f"{'Split:': <10} {', '.join(self._splits)}\n"
            f"{'Images:': <10} {len(self._labels)}\n"
            f"{'Boxes:': <10} {sum(n_boxes)}\n"
            f"{'Classes:': <10} {len(self.classes)}\n"
        ) + "-" * 35 + "\n"
        for i, n in enumerate(n_boxes):
            out += f"{i: <3} {self.wn_classes[i]: <10} {self.classes[i]: <15} {n}\n"
            cls_boxes.append([i, self.wn_classes[i], self.classes[i], n])
        out += "-" * 35 + "\n"
        return out, cls_boxes
