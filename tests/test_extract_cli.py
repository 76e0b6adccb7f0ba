"""End-to-end smoke of extract_base_features.py (subprocess: its absl flags
collide with the other CLIs').  Covers the mesh-sharded sweep with a
non-divisible tail batch and the staged device-prefetch input path
(reference extract_base_features.py:115-155)."""
import os
import subprocess
import sys

from videoyolo_tpu.utils.general import cpu_cache_dir

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_extract_cli_writes_feature_files(tmp_path):
    import cv2

    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"im{i}.jpg"
        cv2.imwrite(str(p), rng.randint(0, 255, (120, 150, 3), np.uint8))
        paths.append(str(p))
    listing = tmp_path / "files.txt"
    listing.write_text("\n".join(paths))
    save_dir = tmp_path / "features"

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [
            sys.executable,
            "extract_base_features.py",
            f"--dataset={listing}",
            f"--save_dir={save_dir}",
            "--batch_size=2",  # 3 images -> tail batch of 1, padded to 2 devs
            "--data_shape=96",
            "--num_workers=1",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]
    for i in range(3):
        f1 = np.load(save_dir / f"im{i}_F1.npy")
        f2 = np.load(save_dir / f"im{i}_F2.npy")
        f3 = np.load(save_dir / f"im{i}_F3.npy")
        assert f1.shape == (12, 12, 256)
        assert f2.shape == (6, 6, 512)
        assert f3.shape == (3, 3, 1024)
        assert np.isfinite(f1).all()
    assert not list(save_dir.glob("*.tmp")), "atomic-save tmp left behind"

    # --skip_existing resumes: delete one sample's files, rerun — only the
    # missing sample is extracted (the log says 1/3), the rest untouched
    mtime_before = os.path.getmtime(save_dir / "im0_F1.npy")
    for s in ("_F1", "_F2", "_F3"):
        os.remove(save_dir / f"im2{s}.npy")
    r2 = subprocess.run(
        [
            sys.executable,
            "extract_base_features.py",
            f"--dataset={listing}",
            f"--save_dir={save_dir}",
            "--batch_size=2",
            "--data_shape=96",
            "--num_workers=1",
            "--skip_existing",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    out2 = r2.stdout + r2.stderr
    assert r2.returncode == 0, out2[-4000:]
    assert "Resuming: 1/3" in out2, out2[-2000:]
    assert np.load(save_dir / "im2_F1.npy").shape == (12, 12, 256)
    assert os.path.getmtime(save_dir / "im0_F1.npy") == mtime_before

    # all present -> no work at all
    r3 = subprocess.run(
        [
            sys.executable,
            "extract_base_features.py",
            f"--dataset={listing}",
            f"--save_dir={save_dir}",
            "--data_shape=96",
            "--num_workers=1",
            "--skip_existing",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    out3 = r3.stdout + r3.stderr
    assert r3.returncode == 0, out3[-4000:]
    assert "already extracted" in out3, out3[-2000:]
