"""CombinedDetection + class tree + hierarchical NMS + YouTube-BB
(reference combined.py / youtubebb.py / detect_yolo3.py:736-789)."""
import csv
import os

import numpy as np
import pytest

from videoyolo_tpu.data.combined import CombinedDetection, load_tree


class _FakeDataset:
    """Minimal dataset implementing the shared protocol."""

    name = "fake"

    def __init__(self, classes, wn_classes, labels):
        self._classes = classes
        self._wn = wn_classes
        self._labels = labels  # list of (N, 6) arrays

    @property
    def classes(self):
        return self._classes

    @property
    def wn_classes(self):
        return self._wn

    def __len__(self):
        return len(self._labels)

    def __getitem__(self, idx):
        img = np.zeros((32, 32, 3), np.uint8)
        return img, self._labels[idx].copy()

    def _load_label(self, idx):
        return self._labels[idx].copy()

    def sample_path(self, idx):
        return f"/fake/{self.name}/{idx}.jpg"

    def image_size(self, sid):
        return 32, 32


def _datasets():
    # dog (n02084071) and domestic cat (n02121808) are leaves of
    # filtered_det.tree; their ancestor chains exercise the tree logic
    lbl1 = np.array([[1, 2, 20, 22, 0, 0]], np.float64)
    lbl2 = np.array([[3, 4, 18, 20, 0, 0]], np.float64)
    d1 = _FakeDataset(["dog"], ["n02084071"], [lbl1])
    d2 = _FakeDataset(["cat"], ["n02121808"], [lbl2])
    return d1, d2


def test_tree_assets_load():
    parents = load_tree()
    assert len(parents) == 285
    assert sum(1 for p in parents.values() if p == "ROOT") >= 1
    # every non-root parent must itself be a node
    for node, parent in parents.items():
        assert parent == "ROOT" or parent in parents


def test_combined_flat_remap():
    d1, d2 = _datasets()
    comb = CombinedDetection([d1, d2])
    assert len(comb) == 2
    assert len(comb.classes) == 2
    _, l0 = comb[0]
    _, l1 = comb[1]
    assert l0[0, 4] == 0 and l1[0, 4] == 1


def test_combined_class_tree_multihot():
    d1, d2 = _datasets()
    comb = CombinedDetection([d1, d2], class_tree=True)
    assert len(comb.classes) == 285
    _, label = comb[0]
    assert label.shape[1] == 4 + 285
    hot = np.where(label[0, 4:] == 1)[0]
    # the whole ancestor branch is hot, dog itself included
    assert comb.wn_classes.index("n02084071") in hot
    assert len(hot) == len(comb.branches_ind[comb.wn_classes.index("n02084071")])


def test_combined_validation_duplicates():
    d1, d2 = _datasets()
    comb = CombinedDetection([d1, d2], class_tree=True, validation=True)
    _, label = comb[0]
    dog = comb.wn_classes.index("n02084071")
    assert label.shape[0] == len(comb.branches_ind[dog])  # one per ancestor
    assert set(label[:, 4].astype(int)) == set(comb.branches_ind[dog])


def test_on_branch_and_levels():
    d1, d2 = _datasets()
    comb = CombinedDetection([d1, d2], class_tree=True)
    dog = comb.wn_classes.index("n02084071")
    cat = comb.wn_classes.index("n02121808")
    for anc in comb.branches_ind[dog][:-1]:
        assert comb.on_branch(dog, anc)
    assert not comb.on_branch(dog, cat)
    levels = comb.get_levels()
    assert levels[dog] > 1  # a leaf deep in the tree
    leaves = comb.get_leaves()
    assert leaves[dog] == 1


def test_hierarchical_nms_merges_lineage():
    import detect_yolo3 as cli

    d1, d2 = _datasets()
    comb = CombinedDetection([d1, d2], class_tree=True)
    dog = comb.wn_classes.index("n02084071")
    parent = comb.branches_ind[dog][-2]  # dog's direct parent
    cat = comb.wn_classes.index("n02121808")
    preds = {
        "img": [
            [dog, 0.9, 0.1, 0.1, 0.5, 0.5],
            [parent, 0.7, 0.11, 0.11, 0.5, 0.5],  # same box, ancestor -> drop
            [cat, 0.8, 0.6, 0.6, 0.9, 0.9],  # different box -> keep
        ]
    }
    out = cli.hierarchical_nms(preds, comb, ov_thresh=0.5, level_thresh=10)
    kept = out["img"]
    assert len(kept) == 2
    assert sorted(b[0] for b in kept) == sorted([dog, cat])


def test_youtubebb_from_csv(tmp_path):
    from videoyolo_tpu.data.youtubebb import YouTubeBBDetection

    root = tmp_path / "YouTubeBB"
    root.mkdir()
    # csv schema: vid, ts_ms, class_id, class_name, obj_id, present,
    # xmin, xmax, ymin, ymax (fractions)
    rows = [
        ["vidA", "0", "0", "person", "0", "present", "0.1", "0.5", "0.1", "0.6"],
        ["vidA", "1000", "0", "person", "0", "present", "0.2", "0.6", "0.1", "0.6"],
        ["vidA", "2000", "0", "person", "0", "absent", "-1", "-1", "-1", "-1"],
        ["vidB", "0", "1", "bird", "0", "present", "0.3", "0.7", "0.2", "0.8"],
    ]
    with open(root / "yt_bb_detection_train.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)

    ds = YouTubeBBDetection(root=str(root), splits=["train"], download=False)
    # absent frame removed when allow_empty=False
    assert len(ds) == 3
    assert len(ds.classes) == len(ds.wn_classes) == len(ds.class_ids)
    lbl = ds._load_label(0)
    assert lbl.shape[1] == 6
    assert 0 <= lbl[0, 0] <= 1  # fractional coords kept (youtubebb.py:490-523)

    # windows clamp at clip bounds like ImageNet-VID
    dsw = YouTubeBBDetection(
        root=str(root), splits=["train"], download=False, window=(3, 1)
    )
    wins = dsw._windows
    assert all(len(w) == 3 for w in wins.values())
