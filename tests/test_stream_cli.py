"""End-to-end smoke of detect_yolo3.py --stream (subprocess: absl flags).

Two image directories act as two videos: the stream must process frames in
order, reset at the directory boundary, and write one normalized pred line
set per FRAME (the windowed path would need a video dataset; --stream
lifts that restriction for ad-hoc inputs — no reference equivalent).
Numeric windowed-equivalence is locked separately in test_streaming.py."""
import os
import subprocess
import sys

from videoyolo_tpu.utils.general import cpu_cache_dir

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stream_cli_detects_per_frame(tmp_path):
    import cv2

    rng = np.random.RandomState(0)
    dirs = []
    for v in range(2):
        d = tmp_path / f"vid{v}"
        d.mkdir()
        for i in range(3):
            # unique basenames: the pred/*.txt cache keys on basename
            cv2.imwrite(
                str(d / f"v{v}_{i:04d}.jpg"),
                rng.randint(0, 255, (120, 150, 3), np.uint8),
            )
        dirs.append(str(d))
    save_dir = tmp_path / "results"

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [
            sys.executable,
            "detect_yolo3.py",
            f"--dataset={dirs[0]},{dirs[1]}",
            f"--save_dir={save_dir}",
            "--save_prefix=smoke",
            "--stream",
            "--window=3,1",
            "--k_join_type=max",
            "--k_join_pos=late",
            "--data_shape=64",
            "--batch_size=1",
            "--num_workers=1",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]

    pred_dir = save_dir / "smoke" / "pred"
    files = sorted(os.listdir(pred_dir))
    assert len(files) == 6, files  # one per frame, both videos
    for f in files:
        for line in (pred_dir / f).read_text().splitlines():
            parts = line.split(",")
            assert len(parts) == 7
            assert 0.0 <= float(parts[2]) <= 1.0


def test_stream_cli_t5_funnel_center(tmp_path):
    """--stream covers the YOLOv3Temporal family (--temp, t=5 funnel) with
    --stream_anchor center: windows are centered on each frame with
    clip-bound clamping (the reference window sampler), emitted k//2 frames
    late with a tail flush — still exactly one pred file per frame."""
    import cv2

    rng = np.random.RandomState(2)
    d = tmp_path / "vid"
    d.mkdir()
    for i in range(7):
        cv2.imwrite(
            str(d / f"{i:04d}.jpg"), rng.randint(0, 255, (96, 128, 3), np.uint8)
        )
    save_dir = tmp_path / "results"

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [
            sys.executable,
            "detect_yolo3.py",
            f"--dataset={d}",
            f"--save_dir={save_dir}",
            "--save_prefix=t5c",
            "--stream",
            "--stream_anchor=center",
            "--temp",
            "--window=5,1",
            "--data_shape=64",
            "--batch_size=1",
            "--num_workers=1",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]
    assert len(os.listdir(save_dir / "t5c" / "pred")) == 7


def test_stream_cli_quantized(tmp_path):
    """--stream composes with --quantize: calibration windows are stacked
    from the first frame batches (the stream loader yields single frames)."""
    import cv2

    rng = np.random.RandomState(1)
    d = tmp_path / "vid"
    d.mkdir()
    for i in range(4):
        cv2.imwrite(
            str(d / f"{i:04d}.jpg"), rng.randint(0, 255, (96, 128, 3), np.uint8)
        )
    save_dir = tmp_path / "results"

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [
            sys.executable,
            "detect_yolo3.py",
            f"--dataset={d}",
            f"--save_dir={save_dir}",
            "--save_prefix=q",
            "--stream",
            "--window=3,1",
            "--k_join_type=max",
            "--k_join_pos=late",
            "--quantize=int8_static",
            "--data_shape=64",
            "--batch_size=1",
            "--num_workers=1",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]
    assert len(os.listdir(save_dir / "q" / "pred")) == 4


def _make_vid_tree(tmp_path, n_clips=1, n_frames=6):
    """Synthetic ImageNet-VID val layout under tmp_path/ImageNetVID/ILSVRC."""
    import cv2

    from videoyolo_tpu.data.base import load_names

    wn = load_names("imagenetvid_wn")
    root = tmp_path / "ImageNetVID" / "ILSVRC"
    (root / "ImageSets" / "VID").mkdir(parents=True)
    lines = []
    frame_id = 1
    for clip_i in range(n_clips):
        clip = f"ILSVRC2017_val_{clip_i:08d}"
        (root / "Data" / "VID" / "val" / clip).mkdir(parents=True)
        (root / "Annotations" / "VID" / "val" / clip).mkdir(parents=True)
        for f in range(n_frames):
            fname = f"{f:06d}"
            cv2.imwrite(
                str(root / "Data" / "VID" / "val" / clip / f"{fname}.JPEG"),
                np.zeros((96, 128, 3), np.uint8),
            )
            x1 = 10 + 2 * f
            xml = (
                "<annotation><size><width>128</width><height>96</height></size>"
                f"<object><name>{wn[clip_i]}</name><trackid>0</trackid>"
                f"<bndbox><xmax>{x1 + 40}</xmax><xmin>{x1}</xmin>"
                "<ymax>80</ymax><ymin>30</ymin></bndbox></object></annotation>"
            )
            (
                root / "Annotations" / "VID" / "val" / clip / f"{fname}.xml"
            ).write_text(xml)
            lines.append(f"{clip}/{fname} {frame_id}")
            frame_id += 1
    (root / "ImageSets" / "VID" / "val.txt").write_text("\n".join(lines))
    return root


def test_stream_cli_t5_mult_out_flat_layout(tmp_path):
    """--stream with a t_out model (--temp --mult_out) on the VID dataset:
    the stream emits ONE prediction per frame (the anchor frame's own
    offset), so predictions, the txt cache, AND the eval tail all use the
    flat single-dict layout — not the windowed path's 5 pred_o{t} dirs
    (this combination crashed in save_predictions and again in evaluate()
    before _mult_out_layout())."""
    _make_vid_tree(tmp_path)
    save_dir = tmp_path / "results"

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [
            sys.executable,
            "detect_yolo3.py",
            "--dataset=vid",
            f"--dataset_root={tmp_path}",
            f"--save_dir={save_dir}",
            "--save_prefix=t5m",
            "--stream",
            "--temp",
            "--mult_out",
            "--every=1",
            "--window=5,1",
            "--data_shape=64",
            "--batch_size=1",
            "--num_workers=1",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]
    pred_dir = save_dir / "t5m" / "pred"
    assert pred_dir.is_dir(), os.listdir(save_dir / "t5m")
    clips = os.listdir(pred_dir)
    assert len(clips) == 1 and len(os.listdir(pred_dir / clips[0])) == 6
    # no per-offset dirs: the flat layout is the stream contract
    assert not [
        p for p in os.listdir(save_dir / "t5m") if p.startswith("pred_o")
    ]
    # the eval tail ran on the flat per-frame predictions
    assert (save_dir / "t5m" / "voc.txt").exists()


def test_stream_cli_vid_dataset_single_frames(tmp_path):
    """--dataset vid --stream: the dataset must yield SINGLE frames in clip
    order (the model still takes --window k); before the fix the windowed
    dataset fed (k,H,W,3) stacks into the single-frame transform.  Runs
    through detection AND the VOC eval tail (per-frame gt)."""
    import cv2

    from videoyolo_tpu.data.base import load_names

    wn = load_names("imagenetvid_wn")
    root = tmp_path / "ImageNetVID" / "ILSVRC"
    (root / "ImageSets" / "VID").mkdir(parents=True)
    lines = []
    frame_id = 1
    for clip_i in range(2):
        clip = f"ILSVRC2017_val_{clip_i:08d}"
        (root / "Data" / "VID" / "val" / clip).mkdir(parents=True)
        (root / "Annotations" / "VID" / "val" / clip).mkdir(parents=True)
        for f in range(4):
            fname = f"{f:06d}"
            cv2.imwrite(
                str(root / "Data" / "VID" / "val" / clip / f"{fname}.JPEG"),
                np.zeros((96, 128, 3), np.uint8),
            )
            x1 = 10 + 2 * f
            xml = (
                "<annotation><size><width>128</width><height>96</height></size>"
                f"<object><name>{wn[clip_i]}</name><trackid>0</trackid>"
                f"<bndbox><xmax>{x1 + 40}</xmax><xmin>{x1}</xmin>"
                "<ymax>80</ymax><ymin>30</ymin></bndbox></object></annotation>"
            )
            (
                root / "Annotations" / "VID" / "val" / clip / f"{fname}.xml"
            ).write_text(xml)
            lines.append(f"{clip}/{fname} {frame_id}")
            frame_id += 1
    (root / "ImageSets" / "VID" / "val.txt").write_text("\n".join(lines))
    save_dir = tmp_path / "results"

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [
            sys.executable,
            "detect_yolo3.py",
            "--dataset=vid",
            f"--dataset_root={tmp_path}",
            f"--save_dir={save_dir}",
            "--save_prefix=vidstream",
            "--stream",
            "--every=1",
            "--window=3,1",
            "--k_join_type=max",
            "--k_join_pos=late",
            "--data_shape=64",
            "--batch_size=1",
            "--num_workers=1",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]
    pred_dir = save_dir / "vidstream" / "pred"
    # vid layout: one subdir per clip, one txt per frame
    txts = [
        os.path.join(c, t)
        for c in sorted(os.listdir(pred_dir))
        for t in sorted(os.listdir(os.path.join(pred_dir, c)))
    ]
    assert len(txts) == 8, txts
    assert (save_dir / "vidstream" / "voc.txt").exists()
