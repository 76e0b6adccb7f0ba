"""Tests for the COCO dataset loader, self-contained CocoEval, and metric."""
import json
import os

import numpy as np
import pytest

from videoyolo_tpu.data.cocojson import CocoEval, CocoIndex, bbox_iou_xywh


def make_gt(tmp_path, anns, imgs=None, ncats=2):
    from videoyolo_tpu.data.base import load_names

    coco_names = load_names("coco")
    cats = [{"id": i + 1, "name": coco_names[i]} for i in range(ncats)]
    if imgs is None:
        imgs = [{"id": 1, "width": 640, "height": 480, "file_name": "im1.jpg",
                 "coco_url": "http://x/val2017/im1.jpg"}]
    ds = {"images": imgs, "categories": cats, "annotations": anns}
    path = tmp_path / "instances_test.json"
    path.write_text(json.dumps(ds))
    return str(path)


def ann(aid, img, cat, bbox, iscrowd=0):
    return {"id": aid, "image_id": img, "category_id": cat, "bbox": list(bbox),
            "area": bbox[2] * bbox[3], "iscrowd": iscrowd}


def det(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), "score": score}


def run_eval(gt_path, results):
    gt = CocoIndex(gt_path)
    dt = gt.load_results(results)
    e = CocoEval(gt, dt)
    e.evaluate()
    e.accumulate()
    e.summarize()
    return e


def test_iou_xywh_and_crowd():
    d = np.array([[0, 0, 10, 10]], float)
    g = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], float)
    iou = bbox_iou_xywh(d, g, [0, 0])
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25 / 175)
    # crowd: intersection / det area
    iou_c = bbox_iou_xywh(d, g, [0, 1])
    np.testing.assert_allclose(iou_c[0, 1], 25 / 100)


def test_perfect_detection_map_1(tmp_path):
    gt_path = make_gt(tmp_path, [ann(1, 1, 1, (100, 100, 50, 80))])
    e = run_eval(gt_path, [det(1, 1, (100, 100, 50, 80), 0.9)])
    np.testing.assert_allclose(e.stats[0], 1.0)  # AP .5:.95
    np.testing.assert_allclose(e.stats[1], 1.0)  # AP .5


def test_half_iou_detection(tmp_path):
    # det shifted so IoU ~ 0.5: passes IoU .5 threshold but not higher ones
    gt_path = make_gt(tmp_path, [ann(1, 1, 1, (100, 100, 60, 60))])
    e = run_eval(gt_path, [det(1, 1, (120, 100, 60, 60), 0.9)])  # IoU = 40/80 = .5
    np.testing.assert_allclose(e.stats[1], 1.0)  # AP@.5 = 1
    assert e.stats[0] < 0.2  # only the .5 threshold matched (1/10 thresholds)


def test_missed_gt_limits_recall(tmp_path):
    gt_path = make_gt(
        tmp_path, [ann(1, 1, 1, (100, 100, 50, 50)), ann(2, 1, 1, (300, 300, 50, 50))]
    )
    e = run_eval(gt_path, [det(1, 1, (100, 100, 50, 50), 0.9)])
    # 1 of 2 gts found with no FPs: AP@.5 = 0.5 (101-pt: precision 1 up to R=.5)
    assert 0.45 <= e.stats[1] <= 0.55


def test_crowd_gt_not_required(tmp_path):
    # crowd gts are ignore regions: matching them neither helps nor hurts
    gt_path = make_gt(
        tmp_path,
        [ann(1, 1, 1, (100, 100, 50, 50)), ann(2, 1, 1, (300, 300, 100, 100), iscrowd=1)],
    )
    e = run_eval(gt_path, [det(1, 1, (100, 100, 50, 50), 0.9),
                           det(1, 1, (310, 310, 80, 80), 0.8)])
    np.testing.assert_allclose(e.stats[1], 1.0)


def test_area_ranges(tmp_path):
    # one small (16x16=256 < 32^2) and one large gt (200x200)
    gt_path = make_gt(
        tmp_path, [ann(1, 1, 1, (10, 10, 16, 16)), ann(2, 1, 1, (200, 100, 200, 200))]
    )
    e = run_eval(
        gt_path,
        [det(1, 1, (10, 10, 16, 16), 0.9), det(1, 1, (200, 100, 200, 200), 0.8)],
    )
    np.testing.assert_allclose(e.stats[3], 1.0)  # AP small
    np.testing.assert_allclose(e.stats[5], 1.0)  # AP large
    assert e.stats[4] == -1.0  # no medium gts


def test_coco_dataset_loader(tmp_path):
    import cv2

    from videoyolo_tpu.data.mscoco import COCODetection

    root = tmp_path / "MSCoco"
    (root / "annotations").mkdir(parents=True)
    (root / "images" / "val2017").mkdir(parents=True)
    from videoyolo_tpu.data.base import load_names

    coco_names = load_names("coco")
    cats = [{"id": i * 2 + 1, "name": n} for i, n in enumerate(coco_names)]  # sparse ids
    imgs, anns = [], []
    rng = np.random.RandomState(0)
    for i in range(3):
        fname = f"{i:012d}.jpg"
        cv2.imwrite(str(root / "images" / "val2017" / fname),
                    rng.randint(0, 255, (240, 320, 3), np.uint8))
        imgs.append({"id": i + 1, "width": 320, "height": 240, "file_name": fname,
                     "coco_url": f"http://images.cocodataset.org/val2017/{fname}"})
        anns.append(ann(len(anns) + 1, i + 1, 1, (10, 10, 50, 50)))
        anns.append(ann(len(anns) + 1, i + 1, 5, (100, 100, 80, 60), iscrowd=(i == 0)))
    (root / "annotations" / "instances_val2017.json").write_text(
        json.dumps({"images": imgs, "categories": cats, "annotations": anns})
    )

    ds = COCODetection(root=str(root), splits=["instances_val2017"], use_crowd=True)
    assert len(ds) == 3
    img, label = ds[0]
    assert img.shape == (240, 320, 3)
    assert label.shape[1] == 5
    # sparse json ids -> contiguous
    assert set(label[:, 4]) == {0.0, 2.0}
    assert ds.contiguous_id_to_json[0] == 1 and ds.contiguous_id_to_json[2] == 5
    assert ds.sample_to_img_id[0] == 1  # original json ids preserved for eval

    ds2 = COCODetection(root=str(root), splits=["instances_val2017"], use_crowd=False)
    _, label2 = ds2[0]
    assert len(label2) == 1  # crowd box dropped


def test_coco_metric_end_to_end(tmp_path):
    import cv2

    from videoyolo_tpu.data.mscoco import COCODetection
    from videoyolo_tpu.metrics.mscoco import COCODetectionMetric

    root = tmp_path / "MSCoco"
    (root / "annotations").mkdir(parents=True)
    (root / "images" / "val2017").mkdir(parents=True)
    from videoyolo_tpu.data.base import load_names

    coco_names = load_names("coco")
    cats = [{"id": i + 1, "name": n} for i, n in enumerate(coco_names)]
    imgs, anns = [], []
    for i in range(2):
        fname = f"{i:012d}.jpg"
        cv2.imwrite(str(root / "images" / "val2017" / fname), np.zeros((240, 320, 3), np.uint8))
        imgs.append({"id": i + 1, "width": 320, "height": 240, "file_name": fname,
                     "coco_url": f"http://x/val2017/{fname}"})
        anns.append(ann(len(anns) + 1, i + 1, 1, (10, 10, 50, 50)))
    (root / "annotations" / "instances_val2017.json").write_text(
        json.dumps({"images": imgs, "categories": cats, "annotations": anns})
    )
    ds = COCODetection(root=str(root), splits=["instances_val2017"])
    metric = COCODetectionMetric(ds, str(tmp_path / "res"), use_time=False, cleanup=True)
    for i in range(2):
        # perfect prediction in xyxy
        bboxes = np.array([[[10.0, 10.0, 59.0, 59.0]]])
        labels = np.array([[[0.0]]])
        scores = np.array([[[0.95]]])
        metric.update(bboxes, labels, scores)
    names, values = metric.get()
    assert names[-1].startswith("~~~~ MeanAP")
    assert float(values[-1]) == 100.0


def test_imgnetdet_dataset(tmp_path):
    import cv2

    from videoyolo_tpu.data.imgnetdet import ImageNetDetection
    from videoyolo_tpu.data.base import load_names

    wn = load_names("imagenetdet_wn")
    root = tmp_path / "ILSVRC"
    (root / "ImageSets" / "DET").mkdir(parents=True)
    (root / "Annotations" / "DET" / "train").mkdir(parents=True)
    (root / "Data" / "DET" / "train").mkdir(parents=True)
    ids = []
    for i in range(3):
        name = f"img_{i}"
        ids.append(name)
        cv2.imwrite(str(root / "Data" / "DET" / "train" / f"{name}.JPEG"),
                    np.zeros((200, 200, 3), np.uint8))
        objs = "" if i == 2 else f"""<object><name>{wn[3]}</name>
<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>100</xmax><ymax>100</ymax></bndbox></object>"""
        (root / "Annotations" / "DET" / "train" / f"{name}.xml").write_text(
            f"<annotation><size><width>200</width><height>200</height></size>{objs}</annotation>"
        )
    (root / "ImageSets" / "DET" / "train.txt").write_text(
        "\n".join(f"{n} {i+1}" for i, n in enumerate(ids))
    )
    ds = ImageNetDetection(root=str(root), splits=["train"], allow_empty=False)
    assert len(ds) == 2  # empty sample removed
    # nonempty cache written and reused
    assert (root / "ImageSets" / "DET" / "train_nonempty.txt").exists()
    ds2 = ImageNetDetection(root=str(root), splits=["train"], allow_empty=False)
    assert len(ds2) == 2
    img, label = ds[0]
    assert label[0, 4] == 3.0
    ds3 = ImageNetDetection(root=str(root), splits=["train"], allow_empty=True)
    assert len(ds3) == 3
