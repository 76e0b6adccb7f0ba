"""Combined multi-dataset with WordNet class tree.

Capability parity with `/root/reference/datasets/combined.py`
(`CombinedDetection` :16): wraps N datasets into one, remapping every
dataset's classes either into a flat merged list or into the 285-node
WordNet class tree (`trees/filtered_det.tree`) with the id-swap table
(`trees/new_classes.txt`).  Emits:
  * plain mode:     label rows [l,t,r,b,c] with the merged class id;
  * class_tree + validation: per-box duplicates for every tree ancestor
    (combined.py:167-184);
  * class_tree (train): multi-hot rows [l,t,r,b, c_0..c_284] with 1s on the
    box's whole ancestor branch (combined.py:186-202).
Tree utilities `get_levels` / `get_leaves` / `generate_branches` /
`on_branch` (combined.py:99-156) feed hierarchical NMS in detect_yolo3.

The tree/names files are data assets copied verbatim (they are annotation
metadata, not code).  Human-readable names for tree nodes come from nltk's
wordnet when available, else from the member datasets' names files, else the
raw wn id.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .base import ASSETS_DIR, DetectionDataset

__all__ = ["CombinedDetection", "load_tree"]

TREES_DIR = os.path.join(ASSETS_DIR, "trees")


def load_tree(name: str = "filtered_det.tree") -> Dict[str, str]:
    """wn-id -> parent wn-id ('ROOT' at the top)."""
    parents = {}
    with open(os.path.join(TREES_DIR, name)) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                parents[parts[0]] = parts[1]
    return parents


def _load_swap_ids() -> Dict[str, str]:
    swap = {}
    with open(os.path.join(TREES_DIR, "new_classes.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                swap[parts[0]] = parts[1]
    return swap


def _wn_name(wn_id: str, fallback: Dict[str, str]) -> str:
    try:  # pragma: no cover - nltk corpus may be absent in this image
        from nltk.corpus import wordnet as wn

        return wn.synset_from_pos_and_offset("n", int(wn_id[1:]))._name
    except Exception:
        return fallback.get(wn_id, wn_id)


class CombinedDetection(DetectionDataset):
    """Combine datasets, remapping classes (combined.py:16-202)."""

    name = "comb"

    def __init__(
        self,
        datasets: Sequence[DetectionDataset],
        class_tree: bool = False,
        validation: bool = False,
        inference: bool = False,
        hier_level: int = 10,
    ):
        super().__init__(inference=inference)
        self._datasets = list(datasets)
        self._class_tree = class_tree
        self._validation = validation
        self.hier_level = hier_level

        # flat sample index -> (dataset_idx, sample_idx)
        self._samples = []
        for di, ds in enumerate(self._datasets):
            self._samples.extend((di, i) for i in range(len(ds)))
        self.sample_ids = list(range(len(self._samples)))

        self._build_classes()
        self.class_levels = self._get_levels()
        self.leaves = self._get_leaves()
        self.branches, self.branches_ind = self._generate_branches()

    # --- class bookkeeping (combined.py:55-97) ------------------------------
    def _build_classes(self):
        name_fallback = {}
        for ds in self._datasets:
            for n, w in zip(ds.classes, ds.wn_classes):
                name_fallback.setdefault(w, n)

        classes_wn: List[str] = []
        classes: List[str] = []
        self.parents: Optional[Dict[str, str]] = None
        swap_ids = {}
        if self._class_tree:
            self.parents = load_tree()
            for wn_id in self.parents:
                classes_wn.append(wn_id)
                classes.append(_wn_name(wn_id, name_fallback))
            swap_ids = _load_swap_ids()

        self._dataset_class_map: List[List[int]] = []
        for ds in self._datasets:
            cmap = []
            for cls in ds.wn_classes:
                if cls not in classes_wn:
                    if self._class_tree:
                        assert cls in swap_ids, (
                            f"{cls} not in the tree or new_classes.txt swap table"
                        )
                        cls = swap_ids[cls]
                    else:
                        classes_wn.append(cls)
                        classes.append(name_fallback.get(cls, cls))
                cmap.append(classes_wn.index(cls))
            self._dataset_class_map.append(cmap)
        self._classes = classes
        self._wn_classes = classes_wn

    @property
    def classes(self):
        return self._classes

    @property
    def wn_classes(self):
        return self._wn_classes

    def get_sample_ids(self):
        return self.sample_ids

    # --- tree utilities (combined.py:99-156) --------------------------------
    def _ancestors(self, cls_idx: int) -> List[int]:
        """cls + all its ancestors, root-first."""
        branch = [cls_idx]
        wn_id = self._wn_classes[cls_idx]
        while wn_id in self.parents and self.parents[wn_id] != "ROOT":
            wn_id = self.parents[wn_id]
            branch.append(self._wn_classes.index(wn_id))
        branch.reverse()
        return branch

    def _generate_branches(self):
        branches, branches_ind = {}, {}
        if not self._class_tree:
            return branches, branches_ind
        for i, wn_id in enumerate(self._wn_classes):
            idxs = self._ancestors(i)
            branches[wn_id] = [self._wn_classes[j] for j in idxs]
            branches_ind[i] = idxs
        return branches, branches_ind

    def _get_levels(self):
        if not self._class_tree:
            return [0] * len(self._wn_classes)
        return [len(self._ancestors(i)) for i in range(len(self._wn_classes))]

    def _get_leaves(self):
        if not self._class_tree:
            return [1] * len(self._wn_classes)
        is_parent = {self.parents[c] for c in self._wn_classes}
        return [0 if c in is_parent else 1 for c in self._wn_classes]

    def get_levels(self):
        return self.class_levels

    def get_leaves(self):
        return self.leaves

    def on_branch(self, c1: int, c2: int) -> bool:
        """Same-lineage test used by hierarchical NMS (combined.py:143-151)."""
        if c1 == c2:
            return True
        child, parent = max(c1, c2), min(c1, c2)
        return parent in self.branches_ind[child]

    # --- samples ------------------------------------------------------------
    def __len__(self):
        return len(self._samples)

    def sample_path(self, idx: int) -> str:
        di, si = self._samples[idx]
        return self._datasets[di].sample_path(si)

    @staticmethod
    def _map_cls(cmap, raw) -> int:
        """Subset class id -> combined-tree id; placeholder rows from
        allow_empty images carry class -1, which must STAY -1 (a bare
        cmap[int(raw)] would python-negative-index to the subset's last
        class and fabricate ground truth)."""
        raw = int(raw)
        return int(cmap[raw]) if raw >= 0 else -1

    def _load_label(self, idx: int) -> np.ndarray:
        di, si = self._samples[idx]
        label = np.array(self._datasets[di]._load_label(si), dtype=np.float64)
        cmap = self._dataset_class_map[di]
        for row in label:
            row[4] = float(self._map_cls(cmap, row[4]))
        return label

    def __getitem__(self, idx: int):
        di, si = self._samples[idx]
        ds = self._datasets[di]
        sample = list(ds[si])[:2]
        img, label = sample[0], np.array(sample[1], dtype=np.float64)
        cmap = self._dataset_class_map[di]

        if self._class_tree and self._validation:
            # duplicate each box once per ancestor (combined.py:167-184)
            dup = []
            for row in label:
                cls = self._map_cls(cmap, row[4])
                if cls < 0:
                    continue
                for a in self.branches_ind[cls]:
                    bx = row.copy()
                    bx[4] = a
                    dup.append(bx)
            label = (
                np.vstack(dup) if dup else np.zeros((0, label.shape[-1]), np.float64)
            )
        elif self._class_tree:
            # multi-hot ancestor rows [l,t,r,b, onehot(C)] (combined.py:186-202)
            boxes = np.zeros((label.shape[0], 4 + len(self._classes)), np.float64)
            boxes[:, :4] = label[:, :4]
            for bi, row in enumerate(label):
                cls = self._map_cls(cmap, row[4])
                if cls < 0:
                    boxes[bi, :] = -1
                    continue
                boxes[bi, 4 + np.array(self.branches_ind[cls])] = 1.0
            label = boxes
        else:
            for row in label:
                row[4] = float(self._map_cls(cmap, row[4]))

        # route through the shared tuple builder: transforms apply the same
        # way as every other dataset, and inference mode keeps the idx the
        # loader's collate needs for batch["idx"]
        return self._transformed(img, label, idx)

    def load_heir_labels(self, idx: int):
        """Per-box ancestor index lists (combined.py:212-224)."""
        di, si = self._samples[idx]
        label = self._datasets[di]._load_label(si)
        cmap = self._dataset_class_map[di]
        return [
            self.branches_ind[self._map_cls(cmap, row[4])]
            for row in label
            if self._map_cls(cmap, row[4]) >= 0
        ]

    def image_size(self, sample_id):
        di, si = self._samples[sample_id]
        ds = self._datasets[di]
        return ds.image_size(ds.sample_ids[si] if hasattr(ds, "sample_ids") else si)
