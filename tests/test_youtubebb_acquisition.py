"""Offline exercise of the YouTube-BB streaming-acquisition path
(reference youtubebb.py:230-383): pre-staged .mp4s stand in for the
downloader (the fetch step is skipped whenever videos/<id>.mp4 exists, so
everything downstream — process-pool frame extraction, error ledger,
grouping/window/subsample — runs for real in this zero-egress CI)."""
import csv
import os

import numpy as np
import pytest

from videoyolo_tpu.data.youtubebb import YouTubeBBDetection

VID_OK = "okvid000001"
VID_MISSING = "missing0002"
TIMESTAMPS = [0, 1000, 2000, 3000]


@pytest.fixture(scope="module")
def yt_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("YouTubeBB")
    # annotations: one present clip per video (class 0 = person, object 0)
    with open(root / "yt_bb_detection_train.csv", "w", newline="") as f:
        w = csv.writer(f)
        for vid in (VID_OK, VID_MISSING):
            for ts in TIMESTAMPS:
                w.writerow(
                    [vid, ts, 0, "person", 0, "present", 0.1, 0.6, 0.2, 0.8]
                )
    # pre-stage the "downloaded" video for VID_OK only: 4s of 320x240@30
    (root / "videos").mkdir()
    vw = cv2.VideoWriter(
        str(root / "videos" / f"{VID_OK}.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (320, 240),
    )
    rs = np.random.RandomState(0)
    for _ in range(4 * 30):
        vw.write(rs.randint(0, 255, (240, 320, 3), np.uint8))
    vw.release()
    return str(root)


def test_acquisition_extracts_frames_and_ledgers_failures(yt_root):
    ds = YouTubeBBDetection(
        root=yt_root, splits=("train",), download=True, keep_vids=True
    )
    # frames of the staged video extracted by the process pool
    for ts in TIMESTAMPS:
        assert os.path.exists(
            os.path.join(yt_root, "frames", VID_OK, f"{ts}.jpg")
        ), ts
    # the unfetchable video landed in the error ledger, not an exception
    ledger = os.path.join(yt_root, "frame_get_errors.txt")
    assert os.path.exists(ledger)
    assert VID_MISSING in open(ledger).read()
    # keep_vids honoured
    assert os.path.exists(os.path.join(yt_root, "videos", f"{VID_OK}.mp4"))

    # per-clip grouping: one clip per (video, class, instance)
    assert len(ds) == len(TIMESTAMPS) * 2
    ok_idx = next(
        i for i in range(len(ds)) if VID_OK in ds.sample_ids[i]
    )
    img, label = ds[ok_idx]
    assert img.ndim == 3 and img.shape[2] == 3
    np.testing.assert_allclose(label[0, :4], [0.1, 0.2, 0.6, 0.8])  # xyxy
    assert label[0, 4] == ds.index_map[0]


def test_second_pass_skips_completed_downloads(yt_root):
    """Resumability: with all frames present, download() plans zero jobs
    (the reference's cache-and-skip acquisition contract)."""
    before = os.path.getmtime(
        os.path.join(yt_root, "frames", VID_OK, f"{TIMESTAMPS[0]}.jpg")
    )
    YouTubeBBDetection(root=yt_root, splits=("train",), download=True, keep_vids=True)
    after = os.path.getmtime(
        os.path.join(yt_root, "frames", VID_OK, f"{TIMESTAMPS[0]}.jpg")
    )
    assert before == after  # not re-extracted


def test_window_and_subsample_paths(yt_root):
    ds = YouTubeBBDetection(
        root=yt_root, splits=("train",), window=(3, 1), allow_empty=True
    )
    ok_idx = next(i for i in range(len(ds)) if VID_OK in ds.sample_ids[i])
    img, label = ds[ok_idx]
    assert img.shape[0] == 3  # (K, H, W, C) volume
    # fraction subsampling halves the frames per clip
    ds_half = YouTubeBBDetection(root=yt_root, splits=("train",), frames=0.5)
    assert len(ds_half) == len(TIMESTAMPS)  # 2 clips x 2 frames
