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


# ---------------------------------------------------------------------------
# Differential test: vectorised vid_eval_motion vs a sequential oracle
# (the same pattern that locks the vectorised VOC matcher in test_metrics.py).


class _FakeVidDataset:
    """Minimal duck-typed dataset for vid_eval_motion: per-image labels,
    per-image motion-iou arrays, class names."""

    def __init__(self, labels, motions, n_classes):
        self._labels = labels  # {img_id: (N, 5) [x1 y1 x2 y2 cls]}
        self.motion_ious = {str(k): np.asarray(v, float) for k, v in motions.items()}
        self.wn_classes = [f"c{i}" for i in range(n_classes)]
        self.classes = list(self.wn_classes)

    def get_sample_ids(self):
        return sorted(self._labels)

    def get_label(self, sid):
        return np.asarray(self._labels[sid], np.float64)


def _oracle_vid_eval_motion(dataset, dt, motion_ranges, area_ranges,
                            iou_threshold=0.5, agnostic=False):
    """Sequential transcription of the FGFA protocol (reference
    metrics/imgnetvid.py:68-286): per (motion, area) range, greedy per-image
    det->gt matching with motion/area ignore masks and fractional FP
    weights.  Deliberately naive — the oracle the fast path must equal."""
    from videoyolo_tpu.metrics.imgnetvid import _overlap, parse_set, vid_ap

    classnames = ["agnostic"] if agnostic else dataset.wn_classes
    ids = dataset.get_sample_ids()
    recs = parse_set(dataset, iou_thr=iou_threshold, pixel_tolerance=10)
    dets = {}
    for r in dt:
        dets.setdefault(int(r[0]), []).append(
            (float(r[2]), 0 if agnostic else int(r[1]), [float(v) for v in r[3:7]])
        )
    for k in dets:
        dets[k].sort(key=lambda t: -t[0])

    all_motion = np.concatenate([dataset.motion_ious[str(k)] for k in ids])
    ap = np.zeros((len(motion_ranges), len(area_ranges), len(classnames)))
    for mi, (m_lo, m_hi) in enumerate(motion_ranges):
        in_r = (all_motion >= m_lo) & (all_motion <= m_hi)
        empty_weight = in_r.sum() / float(len(all_motion))
        for ai, (a_lo, a_hi) in enumerate(area_ranges):
            rows = []  # (conf, label, tp, fp)
            npos = np.zeros(len(classnames))
            for rec in recs:
                img_id = rec["img_ids"]
                gt_boxes, gt_thr = rec["bbox"], rec["thr"]
                gt_labels = rec["label"] * 0 if agnostic else rec["label"]
                raw_motion = dataset.motion_ious[str(img_id)]
                ig_motion = [(m < m_lo) or (m > m_hi) for m in raw_motion]
                ig_area = [
                    ((b[3] - b[1] + 1) * (b[2] - b[0] + 1) < a_lo)
                    or ((b[3] - b[1] + 1) * (b[2] - b[0] + 1) > a_hi)
                    for b in gt_boxes
                ]
                for k, lab in enumerate(gt_labels):
                    npos[lab] += 1
                    if ig_motion[k] or ig_area[k]:
                        npos[lab] -= 1
                taken = [False] * len(gt_labels)
                for conf, lab, bb in dets.get(img_id, []):
                    ovmax, kmax, ov_ig, ov_nig = -1, -1, -1, -1
                    for k in range(len(gt_labels)):
                        ov = _overlap(bb, gt_boxes[k])
                        if ov >= gt_thr[k] and ov > ovmax and not taken[k] and lab == gt_labels[k]:
                            ovmax, kmax = ov, k
                        if ig_motion[k] and ov > ov_ig:
                            ov_ig = ov
                        if not ig_motion[k] and ov > ov_nig:
                            ov_nig = ov
                    tp = fp = 0.0
                    if kmax >= 0:
                        taken[kmax] = True
                        if not ig_motion[kmax] and not ig_area[kmax]:
                            tp = 1.0
                    else:
                        bb_area = (bb[3] - bb[1] + 1) * (bb[2] - bb[0] + 1)
                        if a_lo <= bb_area <= a_hi:
                            if ov_nig > ov_ig:
                                fp = 1.0
                            elif ov_ig > ov_nig:
                                fp = 0.0
                            elif len(gt_labels) == 0:
                                fp = empty_weight
                            else:
                                fp = sum(ig_motion) / float(len(gt_labels))
                    rows.append((conf, lab, tp, fp))
            rows.sort(key=lambda t: -t[0])
            for c in range(len(classnames)):
                sel = [(t, f) for conf, lab, t, f in rows if lab == c]
                if npos[c] <= 0:
                    ap[mi, ai, c] = -1
                    continue
                tp_c = np.cumsum([t for t, _ in sel])
                fp_c = np.cumsum([f for _, f in sel])
                rec_ = tp_c / npos[c]
                prec = tp_c / np.maximum(tp_c + fp_c, np.finfo(np.float64).eps)
                ap[mi, ai, c] = vid_ap(rec_, prec)
    return ap


def _random_vid_case(rs, n_imgs=6, n_classes=3):
    labels, motions, dt = {}, {}, []
    for img in range(n_imgs):
        ng = rs.randint(0, 5)
        gts = []
        for _ in range(ng):
            x1, y1 = rs.randint(0, 100, 2)
            w, h = rs.randint(4, 120, 2)
            gts.append([x1, y1, x1 + w, y1 + h, rs.randint(0, n_classes)])
        labels[img] = np.asarray(gts, float).reshape(ng, 5)
        motions[img] = rs.rand(ng) if ng else np.zeros(0)
        for _ in range(rs.randint(0, 7)):
            if ng and rs.rand() < 0.7:  # near-gt detection
                g = gts[rs.randint(ng)]
                jitter = rs.randint(-8, 9, 4)
                bb = [g[0] + jitter[0], g[1] + jitter[1], g[2] + jitter[2], g[3] + jitter[3]]
                lab = g[4] if rs.rand() < 0.8 else rs.randint(0, n_classes)
            else:
                x1, y1 = rs.randint(0, 100, 2)
                w, h = rs.randint(4, 120, 2)
                bb, lab = [x1, y1, x1 + w, y1 + h], rs.randint(0, n_classes)
            dt.append([img, int(lab), float(rs.rand())] + [float(v) for v in bb])
    return labels, motions, dt


def test_vid_eval_motion_matches_sequential_oracle():
    """30 randomized VID-shaped cases: the single-match vectorised eval
    equals the sequential per-range oracle on the full (motion, area, class)
    AP tensor, incl. agnostic mode."""
    motion_ranges = [[0.0, 1.0], [0.0, 0.7], [0.7, 0.9], [0.9, 1.0]]
    area_ranges = [[0, 1e10], [0, 2500], [2500, 22500], [22500, 1e10]]
    rs = np.random.RandomState(0)
    for case in range(30):
        labels, motions, dt = _random_vid_case(rs)
        if not dt:
            continue
        ds = _FakeVidDataset(labels, motions, n_classes=3)
        agnostic = case % 5 == 4
        got = vid_eval_motion(
            ds, dt, motion_ranges, area_ranges, iou_threshold=0.5, agnostic=agnostic
        )
        want = _oracle_vid_eval_motion(
            ds, dt, motion_ranges, area_ranges, iou_threshold=0.5, agnostic=agnostic
        )
        np.testing.assert_allclose(got, want, atol=1e-9, err_msg=f"case {case}")


def test_frames_per_video_count(vid_root):
    """frames>1 reference semantics: COUNT frames per video with stride
    ceil(len/count) (extract_base_features.py:44-47)."""
    ds = ImageNetVidDetection(
        root=vid_root, splits=[(2017, "val")], allow_empty=True,
        frames_per_video=3, inference=True,
    )
    # 2 clips x 8 frames, stride ceil(8/3)=3 -> frames 0,3,6 per clip
    assert len(ds) == 6
    names = [os.path.basename(ds.sample_path(i)) for i in range(len(ds))]
    assert names == ["000000.JPEG", "000003.JPEG", "000006.JPEG"] * 2
