"""Tests for datasets, transforms, and the input pipeline (synthetic VOC)."""
import os

import numpy as np
import pytest

from videoyolo_tpu.data import DetectSet, VOCDetection, load_names
from videoyolo_tpu.data.loader import DetectionLoader, collate_detection, pad_labels
from videoyolo_tpu.data.transforms import (
    MixupDetection,
    YOLO3DefaultInferenceTransform,
    YOLO3DefaultTrainTransform,
    YOLO3VideoInferenceTransform,
    YOLO3VideoTrainTransform,
    bbox_flip,
    bbox_resize,
    random_crop_with_constraints,
    random_expand,
)


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    """Synthetic VOC2007 tree with 4 images."""
    import cv2

    root = tmp_path_factory.mktemp("VOCdevkit")
    vroot = root / "VOC2007"
    (vroot / "ImageSets" / "Main").mkdir(parents=True)
    (vroot / "Annotations").mkdir()
    (vroot / "JPEGImages").mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(4):
        name = f"00000{i}"
        names.append(name)
        h, w = rng.randint(200, 400), rng.randint(200, 400)
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(vroot / "JPEGImages" / f"{name}.jpg"), img)
        x1, y1 = rng.randint(1, w // 2), rng.randint(1, h // 2)
        x2, y2 = rng.randint(x1 + 10, w), rng.randint(y1 + 10, h)
        xml = f"""<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>1</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>
</annotation>"""
        (vroot / "Annotations" / f"{name}.xml").write_text(xml)
    (vroot / "ImageSets" / "Main" / "test.txt").write_text("\n".join(names))
    return str(root)


def test_load_names_assets():
    voc = load_names("pascalvoc")
    assert len(voc) == 20 and voc[0] == "aeroplane"
    assert len(load_names("pascalvoc_wn")) == 20
    assert len(load_names("coco")) == 80
    assert len(load_names("imagenetvid")) == 30
    assert len(load_names("imagenetdet")) == 200


def test_voc_dataset(voc_root):
    ds = VOCDetection(root=voc_root, splits=[(2007, "test")])
    assert len(ds) == 4
    img, label = ds[0]
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    assert label.shape[1] == 6
    assert label[0, 4] == ds.index_map["dog"]
    assert label[1, 5] == 1  # difficult flag preserved
    # xml 1-based -> 0-based
    assert ds.sample_path(0).endswith(".jpg")
    out, cls_boxes = ds.stats()
    assert "Images:" in out and len(cls_boxes) == 20


def test_voc_difficult_off(voc_root):
    ds = VOCDetection(root=voc_root, splits=[(2007, "test")], difficult=False)
    _, label = ds[0]
    assert (label[:, 5] == 0).all()


def test_voc_coco_json(voc_root):
    ds = VOCDetection(root=voc_root, splits=[(2007, "test")])
    path = ds.build_coco_json()
    import json

    with open(path) as f:
        j = json.load(f)
    assert len(j["images"]) == 4 and len(j["categories"]) == 20
    assert len(j["annotations"]) == 8


def test_detectset(voc_root):
    files = [
        os.path.join(voc_root, "VOC2007", "JPEGImages", f)
        for f in sorted(os.listdir(os.path.join(voc_root, "VOC2007", "JPEGImages")))
    ]
    ds = DetectSet(files)
    img, label, idx = ds[1]
    assert idx == 1 and (label == -1).all()


def test_train_transform_shapes_and_boxes(voc_root):
    ds = VOCDetection(root=voc_root, splits=[(2007, "test")])
    tf = YOLO3DefaultTrainTransform(416, 416)
    np.random.seed(0)
    img0, label0 = ds[0]
    img, bbox = tf(img0, label0)
    assert img.shape == (416, 416, 3) and img.dtype == np.float32
    if bbox.size:
        assert (bbox[:, 0] <= bbox[:, 2]).all() and (bbox[:, 1] <= bbox[:, 3]).all()
        assert bbox[:, :4].min() >= -1e-3 and bbox[:, :4].max() <= 416 + 1e-3


def test_inference_transform(voc_root):
    ds = VOCDetection(root=voc_root, splits=[(2007, "test")])
    tf = YOLO3DefaultInferenceTransform(320, 320)
    img0, label0 = ds[0]
    img, bbox = tf(img0, label0)
    assert img.shape == (320, 320, 3)
    # boxes scaled exactly by size ratio
    sx = 320 / img0.shape[1]
    np.testing.assert_allclose(bbox[0, 0], label0[0, 0] * sx, rtol=1e-5)


def test_video_transforms():
    np.random.seed(1)
    vol = np.random.randint(0, 255, (3, 200, 300, 3), np.uint8)
    label = np.array([[20.0, 30.0, 120.0, 160.0, 2.0]])
    img, bbox = YOLO3VideoTrainTransform(3, 224, 224)(vol, label)
    assert img.shape == (3, 224, 224, 3)
    img, bbox = YOLO3VideoInferenceTransform(224, 224)(vol, label)
    assert img.shape == (3, 224, 224, 3)
    # per-frame labels path (mult_out)
    imgs, bboxes = YOLO3VideoInferenceTransform(224, 224)(vol, [label.copy() for _ in range(3)])
    assert isinstance(bboxes, list) and len(bboxes) == 3


def test_bbox_transform_fns():
    box = np.array([[10.0, 20.0, 110.0, 220.0, 5.0]])
    flipped = bbox_flip(box, (300, 400), flip_x=True)
    np.testing.assert_allclose(flipped[0, :4], [300 - 110, 20, 300 - 10, 220])
    resized = bbox_resize(box, (300, 400), (600, 200))
    np.testing.assert_allclose(resized[0, :4], [20, 10, 220, 110])
    # list-per-timestep passthrough
    out = bbox_flip([box.copy(), box.copy()], (300, 400), flip_x=True)
    assert isinstance(out, list) and len(out) == 2


def test_random_expand_video():
    vol = np.ones((2, 50, 60, 3), np.uint8) * 7
    np.random.seed(0)
    out, (ox, oy, ow, oh) = random_expand(vol, max_ratio=2, fill=3)
    assert out.shape[0] == 2 and ow >= 60 and oh >= 50
    assert (out[:, oy : oy + 50, ox : ox + 60] == 7).all()


def test_random_crop_keeps_box():
    np.random.seed(0)
    box = np.array([[100.0, 100.0, 200.0, 200.0, 1.0]])
    for _ in range(5):
        bbox, crop = random_crop_with_constraints(box, (400, 400))
        x0, y0, w, h = crop
        assert w > 0 and h > 0
        if bbox.size:
            assert (bbox[:, :2] >= -1e-6).all()


def test_pad_and_collate():
    labels = [np.ones((2, 6)), np.ones((5, 6)), np.zeros((0, 6))]
    padded = pad_labels(labels, 8)
    assert padded.shape == (3, 8, 6)
    assert (padded[0, 2:] == -1).all() and (padded[2] == -1).all()
    samples = [(np.zeros((32, 32, 3)), np.ones((2, 6))), (np.zeros((32, 32, 3)), np.ones((1, 6)))]
    batch = collate_detection(samples, max_boxes=4)
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["gt_boxes"].shape == (2, 4, 4)
    assert batch["gt_ids"].shape == (2, 4, 1)


def test_loader_end_to_end(voc_root):
    ds = VOCDetection(
        root=voc_root, splits=[(2007, "test")], transform=YOLO3DefaultInferenceTransform(160, 160)
    )
    loader = DetectionLoader(ds, batch_size=2, shuffle=True, last_batch="discard", seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 160, 160, 3)
    assert batches[0]["gt_boxes"].shape[0] == 2


def test_loader_discard_semantics(voc_root):
    ds = VOCDetection(root=voc_root, splits=[(2007, "test")])
    ds._transform = YOLO3DefaultInferenceTransform(96, 96)
    loader = DetectionLoader(ds, batch_size=3, last_batch="discard")
    assert len(list(loader)) == 1
    loader = DetectionLoader(ds, batch_size=3, last_batch="keep")
    assert len(list(loader)) == 2


def test_mixup_wrapper(voc_root):
    ds = VOCDetection(root=voc_root, splits=[(2007, "test")])
    mix = MixupDetection(ds)
    np.random.seed(0)
    img, label = mix[0]
    assert label.shape[1] == 7  # mixratio column appended
    ratios = np.unique(label[:, -1])
    assert len(ratios) <= 2 and np.all((ratios > 0) & (ratios <= 1))
    mix.set_mixup(False)
    img, label = mix[0]
    assert (label[:, -1] == 1.0).all()
