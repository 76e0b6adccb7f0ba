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
