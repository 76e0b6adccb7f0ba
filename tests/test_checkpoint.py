"""Checkpoint save/resume/best/GC policies (reference train_yolov3.py
:289-329) and the video/image aux utils (reference utils/video.py,
utils/image.py)."""
import os

import numpy as np
import pytest

from videoyolo_tpu.train.checkpoint import (
    find_latest,
    load_variables,
    resume_params,
    save_params,
    save_variables,
)


def _vars(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "params": {"layer": {"kernel": rs.rand(3, 3).astype(np.float32)}},
        "batch_stats": {"layer": {"mean": rs.rand(3).astype(np.float32)}},
    }


def test_save_load_roundtrip(tmp_path):
    v = _vars()
    p = save_variables(str(tmp_path / "m.params"), v)
    back = load_variables(p, _vars(1))
    np.testing.assert_array_equal(
        back["params"]["layer"]["kernel"], v["params"]["layer"]["kernel"]
    )


def test_best_checkpoint_and_log(tmp_path):
    prefix = str(tmp_path / "exp")
    best = 0.0
    best = save_params(prefix, _vars(), 0.5, best, epoch=0, save_interval=0)
    assert best == 0.5 and os.path.exists(prefix + "_best.params")
    best = save_params(prefix, _vars(), 0.3, best, epoch=1, save_interval=0)
    assert best == 0.5  # no overwrite on regression
    log = open(prefix + "_best_map.log").read().strip().splitlines()
    assert len(log) == 1 and "0.5" in log[0]


def test_positive_interval_saves_every_n(tmp_path):
    prefix = str(tmp_path / "exp")
    for e in range(4):
        save_params(prefix, _vars(), 0.0, 1.0, epoch=e, save_interval=2)
    files = sorted(os.listdir(tmp_path))
    epochs = [f for f in files if f.startswith("exp_000")]
    # reference policy: epoch % N == 0 -> epochs 0 and 2, named
    # {prefix}_{epoch:04d}.params exactly (its resume parses that form)
    assert epochs == ["exp_0000.params", "exp_0002.params"]


def test_negative_interval_gc(tmp_path):
    """Negative interval: save every epoch, GC all but every |N|th + newest
    (train_yolov3.py:301-309)."""
    prefix = str(tmp_path / "exp")
    for e in range(7):
        save_params(prefix, _vars(), 0.0, 1.0, epoch=e, save_interval=-3)
    kept = sorted(
        f for f in os.listdir(tmp_path) if f.startswith("exp_000") and "best" not in f
    )
    kept_epochs = sorted(int(f.split("_")[1][:4]) for f in kept)
    assert kept_epochs == [0, 3, 6]  # every |N|th; strays GC'd at boundaries


def test_find_latest_and_resume(tmp_path):
    prefix = str(tmp_path / "exp")
    for e in (0, 2, 5):
        save_variables(f"{prefix}_{e:04d}.params", _vars(e))
    latest = find_latest(str(tmp_path))
    assert "0005" in latest
    variables, start = resume_params("", -1, str(tmp_path), _vars(9))
    assert start == 6
    np.testing.assert_array_equal(
        variables["params"]["layer"]["kernel"], _vars(5)["params"]["layer"]["kernel"]
    )
    # explicit file resume
    variables, start = resume_params(latest, -1, str(tmp_path), _vars(9))
    assert start == 6


def test_video_roundtrip(tmp_path):
    import cv2

    from videoyolo_tpu.utils.video import frames_to_video, video_to_frames

    frames_dir = tmp_path / "frames_in"
    frames_dir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(10):
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"), rs.randint(0, 255, (64, 80, 3), np.uint8))
    video = frames_to_video(str(frames_dir), str(tmp_path / "out.mp4"), fps=5)
    assert os.path.exists(video)
    out_dir = video_to_frames(video, str(tmp_path / "frames_out"), every=2)
    outs = [f for _, _, fs in os.walk(out_dir) for f in fs if f.endswith(".jpg")]
    assert len(outs) == 5


def test_cv_plot_bbox():
    from videoyolo_tpu.utils.image import cv_plot_bbox

    img = np.zeros((60, 80, 3), np.uint8)
    out = cv_plot_bbox(
        img,
        np.array([[10, 10, 40, 40]]),
        scores=np.array([0.9]),
        labels=np.array([0]),
        class_names=["thing"],
    )
    assert out.shape == img.shape and out.sum() > 0
