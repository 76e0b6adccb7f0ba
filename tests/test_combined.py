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


def _mini_voc(root):
    import cv2

    rng = np.random.RandomState(0)
    vroot = root / "VOCdevkit" / "VOC2007"
    (vroot / "ImageSets" / "Main").mkdir(parents=True)
    (vroot / "Annotations").mkdir()
    (vroot / "JPEGImages").mkdir()
    names = []
    for i in range(2):
        name = f"{i:06d}"
        names.append(name)
        cv2.imwrite(
            str(vroot / "JPEGImages" / f"{name}.jpg"),
            rng.randint(0, 255, (120, 160, 3), np.uint8),
        )
        (vroot / "Annotations" / f"{name}.xml").write_text(
            """<annotation><size><width>160</width><height>120</height></size>
<object><name>dog</name><difficult>0</difficult>
<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>80</xmax><ymax>90</ymax></bndbox>
</object></annotation>"""
        )
    (vroot / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(names))
    from videoyolo_tpu.data.pascalvoc import VOCDetection

    return VOCDetection(root=str(root / "VOCdevkit"), splits=[(2007, "trainval")])


def _mini_coco(root):
    import cv2
    import json

    from videoyolo_tpu.data.base import load_names
    from videoyolo_tpu.data.mscoco import COCODetection

    (root / "annotations").mkdir(parents=True)
    (root / "images" / "train2017").mkdir(parents=True)
    cats = [{"id": i + 1, "name": n} for i, n in enumerate(load_names("coco"))]
    imgs, anns = [], []
    for i in range(2):
        fname = f"{i:012d}.jpg"
        cv2.imwrite(
            str(root / "images" / "train2017" / fname),
            np.zeros((100, 140, 3), np.uint8),
        )
        imgs.append(
            {
                "id": i + 1,
                "width": 140,
                "height": 100,
                "file_name": fname,
                "coco_url": f"http://images.cocodataset.org/train2017/{fname}",
            }
        )
        anns.append(
            {
                "id": i + 1,
                "image_id": i + 1,
                "category_id": 1,  # person
                "bbox": [5, 5, 60, 70],
                "area": 4200,
                "iscrowd": 0,
            }
        )
    (root / "annotations" / "instances_train2017.json").write_text(
        json.dumps({"images": imgs, "categories": cats, "annotations": anns})
    )
    return COCODetection(root=str(root), splits=["instances_train2017"])


def _mini_det(root):
    import cv2

    from videoyolo_tpu.data.base import load_names
    from videoyolo_tpu.data.imgnetdet import ImageNetDetection

    wn = load_names("imagenetdet_wn")
    r = root / "ILSVRC"
    (r / "ImageSets" / "DET").mkdir(parents=True)
    (r / "Annotations" / "DET" / "train").mkdir(parents=True)
    (r / "Data" / "DET" / "train").mkdir(parents=True)
    ids = []
    for i in range(2):
        name = f"img_{i}"
        ids.append(name)
        cv2.imwrite(
            str(r / "Data" / "DET" / "train" / f"{name}.JPEG"),
            np.zeros((90, 110, 3), np.uint8),
        )
        (r / "Annotations" / "DET" / "train" / f"{name}.xml").write_text(
            f"<annotation><size><width>110</width><height>90</height></size>"
            f"<object><name>{wn[3]}</name><bndbox><xmin>4</xmin><ymin>4</ymin>"
            f"<xmax>60</xmax><ymax>60</ymax></bndbox></object></annotation>"
        )
    (r / "ImageSets" / "DET" / "train.txt").write_text(
        "\n".join(f"{n} {i + 1}" for i, n in enumerate(ids))
    )
    return ImageNetDetection(root=str(r), splits=["train"])


def _mini_vid(root):
    import cv2

    from videoyolo_tpu.data.base import load_names
    from videoyolo_tpu.data.imgnetvid import ImageNetVidDetection

    wn = load_names("imagenetvid_wn")
    r = root / "ILSVRC_VID"
    (r / "ImageSets" / "VID").mkdir(parents=True)
    clip = "ILSVRC2017_train_00000000"
    (r / "Data" / "VID" / "train" / clip).mkdir(parents=True)
    (r / "Annotations" / "VID" / "train" / clip).mkdir(parents=True)
    lines = []
    for f in range(4):
        fname = f"{f:06d}"
        cv2.imwrite(
            str(r / "Data" / "VID" / "train" / clip / f"{fname}.JPEG"),
            np.zeros((80, 100, 3), np.uint8),
        )
        (r / "Annotations" / "VID" / "train" / clip / f"{fname}.xml").write_text(
            f"""<annotation><size><width>100</width><height>80</height></size>
<object><name>{wn[0]}</name><trackid>0</trackid>
<bndbox><xmax>70</xmax><xmin>10</xmin><ymax>60</ymax><ymin>10</ymin></bndbox>
</object></annotation>"""
        )
        lines.append(f"{clip}/{fname} {f + 1}")
    (r / "ImageSets" / "VID" / "train.txt").write_text("\n".join(lines))
    return ImageNetVidDetection(root=str(r), splits=[(2017, "train")])


def test_combined_real_four_datasets(tmp_path):
    """The train CLI's --dataset voc,coco,det,vid path over REAL dataset
    classes on synthetic disk layouts (reference CombinedDetection over the
    actual subsets, combined.py:16-98 + train_yolov3.py:227-229): one class
    tree, multi-hot ancestor labels, loader collate."""
    from videoyolo_tpu.data.loader import collate_detection

    voc = _mini_voc(tmp_path / "voc")
    coco = _mini_coco(tmp_path / "MSCoco")
    det = _mini_det(tmp_path / "det")
    vid = _mini_vid(tmp_path / "vid")
    comb = CombinedDetection([voc, coco, det, vid], class_tree=True)

    assert len(comb) == len(voc) + len(coco) + len(det) + len(vid)
    assert len(comb.classes) == 285

    dog = comb.wn_classes.index("n02084071")  # VOC 'dog' leaf
    person = comb.wn_classes.index("n00007846")  # COCO 'person'
    offsets = np.cumsum([0, len(voc), len(coco), len(det)])
    hots = []
    for off in offsets:
        img, label = comb[int(off)]
        assert img.ndim == 3 and label.shape[1] == 4 + 285
        hots.append(set(np.where(label[0, 4:] == 1)[0]))
    assert dog in hots[0]
    assert person in hots[1]

    # loader collate for the multi-hot tree labels (same-size images — the
    # train path resizes via the transform before collate)
    samples = [comb[0], comb[1]]
    batch = collate_detection(samples, max_boxes=8, multihot=285)
    assert batch["gt_ids"].shape == (2, 8, 285)
    assert batch["gt_boxes"].shape == (2, 8, 4)


def test_dataset_stats_tables(tmp_path):
    """data/stats.py offline tables over real dataset classes
    (reference datasets/stats.py:1-200)."""
    from videoyolo_tpu.data.stats import combined_stats_table, dataset_stats

    voc = _mini_voc(tmp_path / "voc")
    det = _mini_det(tmp_path / "det")
    s = dataset_stats(voc)
    assert s["samples"] == 2 and s["boxes"] == 2
    assert s["classes"] == 1  # only 'dog' present
    table = combined_stats_table([voc, det])
    assert isinstance(table, str) and "\t" in table
    for st in (s, dataset_stats(det)):
        assert st["nonempty"] == st["samples"]


def test_combined_empty_placeholder_rows_stay_invalid():
    """allow_empty subsets yield [-1,...,-1] placeholder rows; the class map
    must keep them at -1 (a bare cmap[int(-1)] python-negative-indexes to the
    subset's LAST class and fabricates ground truth)."""
    d1, d2 = _datasets()
    empty = np.full((1, 6), -1.0, np.float64)
    d_empty = _FakeDataset(["dog"], ["n02084071"], [empty])

    # validation mode: no duplicated ancestor boxes for the empty image
    comb = CombinedDetection([d_empty, d2], class_tree=True, validation=True)
    _, label = comb[0]
    assert label.shape[0] == 0, label

    # multi-hot train mode: the placeholder row stays all -1
    comb = CombinedDetection([d_empty, d2], class_tree=True)
    _, label = comb[0]
    assert (label[0] == -1).all(), label[0]

    # flat (no tree) mode: class stays -1
    comb = CombinedDetection([d_empty, d2], class_tree=False)
    _, label = comb[0]
    assert label[0, 4] == -1

    # heir labels skip the placeholder
    assert comb.load_heir_labels(0) == []


def test_youtubebb_numeric_frame_order(tmp_path):
    """Timestamps are millisecond STRINGS: ordering must be numeric, not
    lexicographic ('10000' < '2000' would scramble temporal windows and
    --stream frame order)."""
    from videoyolo_tpu.data.youtubebb import YouTubeBBDetection

    root = tmp_path / "YouTubeBB"
    root.mkdir()
    rows = [
        ["vidA", str(ts), "0", "person", "0", "present", "0.1", "0.5", "0.1", "0.6"]
        for ts in range(0, 12000, 1000)
    ]
    with open(root / "yt_bb_detection_train.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)

    ds = YouTubeBBDetection(root=str(root), splits=["train"], download=False)
    ts = [int(sid.rsplit(",", 1)[1]) for sid in ds.sample_ids]
    assert ts == sorted(ts), ts

    # windows walk the clip in time order
    dsw = YouTubeBBDetection(
        root=str(root), splits=["train"], download=False, window=(3, 1)
    )
    for anchor, win in dsw._windows.items():
        w_ts = [int(w.rsplit(",", 1)[1]) for w in win]
        assert w_ts == sorted(w_ts), (anchor, win)
