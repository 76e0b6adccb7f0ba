"""Bare file-list dataset for ad-hoc inference on arbitrary images
(capability parity with `/root/reference/datasets/detectset.py:9`, labels -1)."""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .base import DetectionDataset, read_image


class DetectSet(DetectionDataset):
    name = "detect"

    def __init__(self, file_list: Sequence[str], transform=None):
        super().__init__(transform=transform, inference=True)
        self._file_list = list(file_list)

    def __len__(self):
        return len(self._file_list)

    def sample_path(self, idx):
        return self._file_list[idx]

    @property
    def classes(self) -> List[str]:
        return []

    @property
    def wn_classes(self) -> List[str]:
        return []

    def _load_label(self, idx):
        return np.full((1, 5), -1.0)

    def __getitem__(self, idx):
        img = read_image(self.sample_path(idx))
        label = self._load_label(idx)
        if self._transform is not None:
            img, label = self._transform(img, label)
        return img, label, idx
