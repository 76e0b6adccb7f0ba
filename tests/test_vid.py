"""Tests for ImageNet-VID dataset (window sampler, every, mult_out, videos,
motion ious) and the motion-aware VID metric."""
import os

import numpy as np
import pytest

from videoyolo_tpu.data.base import load_names
from videoyolo_tpu.data.imgnetvid import ImageNetVidDetection, generate_motion_ious
from videoyolo_tpu.metrics.imgnetvid import VIDDetectionMetric, vid_ap, vid_eval_motion

WN = load_names("imagenetvid_wn")


@pytest.fixture(scope="module")
def vid_root(tmp_path_factory):
    """Two clips x 8 frames, one moving box per clip (track 0)."""
    import cv2

    root = tmp_path_factory.mktemp("ILSVRC")
    (root / "ImageSets" / "VID").mkdir(parents=True)
    lines = []
    frame_id = 1
    for clip_i in range(2):
        clip = f"ILSVRC2017_val_{clip_i:08d}"
        (root / "Data" / "VID" / "val" / clip).mkdir(parents=True)
        (root / "Annotations" / "VID" / "val" / clip).mkdir(parents=True)
        for f in range(8):
            fname = f"{f:06d}"
            cv2.imwrite(
                str(root / "Data" / "VID" / "val" / clip / f"{fname}.JPEG"),
                np.zeros((120, 160, 3), np.uint8),
            )
            x1 = 10 + 2 * f + 20 * clip_i
            xml = f"""<annotation>
  <size><width>160</width><height>120</height></size>
  <object><name>{WN[clip_i]}</name><trackid>0</trackid>
    <bndbox><xmax>{x1 + 40}</xmax><xmin>{x1}</xmin><ymax>90</ymax><ymin>30</ymin></bndbox>
  </object>
</annotation>"""
            (root / "Annotations" / "VID" / "val" / clip / f"{fname}.xml").write_text(xml)
            lines.append(f"{clip}/{fname} {frame_id}")
            frame_id += 1
    (root / "ImageSets" / "VID" / "val.txt").write_text("\n".join(lines))
    return str(root)


def test_frames_mode(vid_root):
    ds = ImageNetVidDetection(root=vid_root, splits=[(2017, "val")])
    assert len(ds) == 16
    img, label = ds[0]
    assert img.shape == (120, 160, 3)
    assert label.shape[1] == 5  # track id stripped in getitem
    raw = ds._load_label(0)
    assert raw.shape[1] == 6 and raw[0, 5] == 0  # track id present in raw labels
    assert ds.sample_path(0).endswith("000000.JPEG")


def test_every_subsampling(vid_root):
    ds = ImageNetVidDetection(root=vid_root, splits=[(2017, "val")], every=2)
    # frames 0,2,4,6 of each clip
    assert len(ds) == 8
    for idx in range(len(ds)):
        frame_num = int(os.path.basename(ds.sample_path(idx))[:-5])
        assert frame_num % 2 == 0


def test_window_sampler_clamping(vid_root):
    ds = ImageNetVidDetection(root=vid_root, splits=[(2017, "val")], window=[5, 1])
    # first frame of clip 1: window clamped to clip start
    w = ds._windows[1]
    assert w == [1, 1, 1, 2, 3]
    # middle frame
    assert ds._windows[4] == [2, 3, 4, 5, 6]
    # last frame of clip 1 (frame_id 8): clamped at clip end, no bleed into clip 2
    assert ds._windows[8] == [6, 7, 8, 8, 8]
    img, label = ds[0]
    assert img.shape == (5, 120, 160, 3)


def test_window_sampler_stride(vid_root):
    ds = ImageNetVidDetection(root=vid_root, splits=[(2017, "val")], window=[3, 2])
    assert ds._windows[5] == [3, 5, 7]
    assert ds._windows[1] == [1, 1, 3]


def test_mult_out_labels(vid_root):
    ds = ImageNetVidDetection(
        root=vid_root, splits=[(2017, "val")], window=[3, 1], mult_out=True
    )
    img, labels = ds[4]
    assert isinstance(labels, list) and len(labels) == 3
    # moving box: labels differ across window frames
    assert labels[0][0, 0] != labels[2][0, 0]
    paths = ds.sample_path(4)
    assert isinstance(paths, list) and len(paths) == 3
    sids = ds.get_sample_ids()
    assert isinstance(sids[0], list) and len(sids[0]) == 3


def test_videos_mode(vid_root):
    ds = ImageNetVidDetection(root=vid_root, splits=[(2017, "val")], videos=True)
    assert len(ds) == 2
    vid, labels = ds[0]
    assert vid.shape == (8, 120, 160, 3)
    assert labels.shape == (8, 20, 6)  # padded per-frame labels
    assert labels[0, 0, 4] >= 0 and (labels[0, 1:] == -1).all()


def test_motion_ious_generation(vid_root):
    path = generate_motion_ious(vid_root, "val")
    import json

    with open(path) as f:
        ious = json.load(f)
    assert len(ious) == 16
    # box moves 2px/frame over 40px width -> neighbours have high IoU
    v = ious["4"][0]
    assert 0.5 < v < 1.0


def test_vid_ap():
    np.testing.assert_allclose(vid_ap(np.array([1.0]), np.array([1.0])), 1.0)
    np.testing.assert_allclose(vid_ap(np.array([0.5]), np.array([1.0])), 0.5)


def test_vid_metric_perfect_detections(vid_root):
    ds = ImageNetVidDetection(root=vid_root, splits=[(2017, "val")])
    generate_motion_ious(vid_root, "val")
    metric = VIDDetectionMetric(ds, conf_score_thresh=0.05)
    for idx in range(len(ds)):
        sid = ds.sample_ids[idx]
        gt = ds.get_label(sid)
        bboxes = gt[None, :, :4]
        labels = gt[None, :, 4:5]
        scores = np.full_like(labels, 0.95)
        metric.update(bboxes, labels, scores, sid=sid)
    names, values = metric.get()
    assert names[0].startswith("~~~~")
    # class APs for the two present classes = 100
    present = {int(ds.get_label(ds.sample_ids[i])[0, 4]) for i in (0, 15)}
    for ci in present:
        assert float(values[1 + ci]) == 100.0


def test_vid_metric_agnostic(vid_root):
    ds = ImageNetVidDetection(root=vid_root, splits=[(2017, "val")])
    metric = VIDDetectionMetric(ds, agnostic=True)
    for idx in range(len(ds)):
        sid = ds.sample_ids[idx]
        gt = ds.get_label(sid)
        metric.update(gt[None, :, :4], gt[None, :, 4:5] * 0, np.full((1, len(gt), 1), 0.9), sid=sid)
    names, values = metric.get()
    assert names[-1] == "agnostic"
    assert float(values[-1]) == 100.0


def test_label_cache_parses_each_xml_once(vid_root, monkeypatch):
    """Round-2: __init__'s warm-up parse is kept; later accesses are dict
    hits (reference re-parses every access, imgnetvid.py:317-351)."""
    import xml.etree.ElementTree as et

    ds = ImageNetVidDetection(root=vid_root, splits=[(2017, "val")])
    assert len(ds._labels) == len(ds)  # warm-up filled the cache
    calls = []
    real = et.parse
    monkeypatch.setattr(et, "parse", lambda *a, **k: calls.append(a) or real(*a, **k))
    lab1 = ds._load_label(0)
    lab2 = ds.get_label(ds.sample_ids[0])
    assert calls == []  # no re-parse
    # cache returns copies: caller mutation cannot poison it
    lab1[:] = -99
    assert not np.array_equal(ds._load_label(0), lab1)
