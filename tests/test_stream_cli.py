"""End-to-end smoke of detect_yolo3.py --stream (subprocess: absl flags).

Two image directories act as two videos: the stream must process frames in
order, reset at the directory boundary, and write one normalized pred line
set per FRAME (the windowed path would need a video dataset; --stream
lifts that restriction for ad-hoc inputs — no reference equivalent).
Numeric windowed-equivalence is locked separately in test_streaming.py."""
import os
import subprocess
import sys

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
        JAX_COMPILATION_CACHE_DIR="/tmp/videoyolo_tpu_jax_cache",
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
        JAX_COMPILATION_CACHE_DIR="/tmp/videoyolo_tpu_jax_cache",
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
        JAX_COMPILATION_CACHE_DIR="/tmp/videoyolo_tpu_jax_cache",
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
