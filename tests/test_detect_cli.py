"""End-to-end smoke of detect_yolo3.py (subprocess: absl flags) over a
2-device virtual mesh: the detect loop shards the batch axis over the mesh
(the TPU-native form of the reference's per-GPU split_and_load loop,
reference detect_yolo3.py:211-222) and pads the non-divisible tail batch,
dropping the padding host-side (the reference's even_split=False).  Also
round-trips the prediction .txt cache: a second run must skip the device
entirely and evaluate from the cached predictions."""
import os
import subprocess
import sys

from videoyolo_tpu.utils.general import cpu_cache_dir

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env):
    return subprocess.run(
        [sys.executable, "detect_yolo3.py"] + args,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )


def test_detect_cli_sharded_with_tail(tmp_path):
    import cv2

    rng = np.random.RandomState(0)
    d = tmp_path / "imgs"
    d.mkdir()
    # 5 images at batch_size 4 -> one full batch + a tail of 1 that the
    # sharded path must pad to the 2-device multiple and then drop
    for i in range(5):
        cv2.imwrite(
            str(d / f"im{i}.jpg"), rng.randint(0, 255, (100, 140, 3), np.uint8)
        )
    save_dir = tmp_path / "results"

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    args = [
        f"--dataset={d}",
        f"--save_dir={save_dir}",
        "--save_prefix=mesh",
        "--data_shape=64",
        "--batch_size=4",
        "--num_workers=1",
    ]
    r = _run(args, env)
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]
    pred_dir = save_dir / "mesh" / "pred"
    files = sorted(os.listdir(pred_dir))
    assert len(files) == 5, files  # exactly one per real image, none for pad
    for f in files:
        for line in (pred_dir / f).read_text().splitlines():
            parts = line.split(",")
            assert len(parts) == 7
            assert 0.0 <= float(parts[2]) <= 1.0

    # cached rerun: must not touch the device (reference detect_yolo3.py:
    # 853-864 resumes from the .txt cache)
    mtimes = {f: os.path.getmtime(pred_dir / f) for f in files}
    r2 = _run(args, env)
    assert r2.returncode == 0, (r2.stdout + r2.stderr)[-4000:]
    assert {f: os.path.getmtime(pred_dir / f) for f in files} == mtimes

    # partial resume (--skip_existing): delete two samples' files — the
    # all-or-nothing cache load fails, but only the 2 missing samples are
    # re-detected and written; finished samples' files are not rewritten
    # (their mtimes survive — a full save would clobber them with empties)
    for f in ("im1.txt", "im3.txt"):
        os.remove(pred_dir / f)
    r3 = _run(args + ["--skip_existing"], env)
    out3 = r3.stdout + r3.stderr
    assert r3.returncode == 0, out3[-4000:]
    assert "Resuming detect: 2/5" in out3, out3[-2000:]
    kept = [f for f in files if f not in ("im1.txt", "im3.txt")]
    assert {f: os.path.getmtime(pred_dir / f) for f in kept} == {
        f: mtimes[f] for f in kept
    }
    for f in ("im1.txt", "im3.txt"):
        for line in (pred_dir / f).read_text().splitlines():
            parts = line.split(",")
            assert len(parts) == 7 and 0.0 <= float(parts[2]) <= 1.0
