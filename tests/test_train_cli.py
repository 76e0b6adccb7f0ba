"""End-to-end smoke of the train CLI main loop on a synthetic VOC tree
(subprocess: train_yolov3's absl flags collide with detect_yolo3's, which
other test files import in-process).

Covers the full driver path the unit tests can't: flag parsing, dataset
construction, loader + device-prefetch staging, jitted train step, logging,
checkpoint write (reference train_yolov3.py:492-681 equivalent)."""
import os
import subprocess
import sys

from videoyolo_tpu.utils.general import cpu_cache_dir

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("data_root")
    rng = np.random.RandomState(0)
    for year in (2007, 2012):
        vroot = root / "PascalVOC" / "VOCdevkit" / f"VOC{year}"
        (vroot / "ImageSets" / "Main").mkdir(parents=True)
        (vroot / "Annotations").mkdir()
        (vroot / "JPEGImages").mkdir()
        names = []
        for i in range(4):
            name = f"{year}_{i:06d}"
            names.append(name)
            h, w = 160, 180
            cv2.imwrite(
                str(vroot / "JPEGImages" / f"{name}.jpg"),
                rng.randint(0, 255, (h, w, 3), np.uint8),
            )
            (vroot / "Annotations" / f"{name}.xml").write_text(
                f"""<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>20</xmin><ymin>30</ymin><xmax>120</xmax><ymax>140</ymax></bndbox>
  </object>
</annotation>"""
            )
        (vroot / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(names))
        (vroot / "ImageSets" / "Main" / "test.txt").write_text("\n".join(names))
    return str(root)


def test_train_cli_one_epoch(voc_tree, tmp_path):
    save_dir = tmp_path / "exp"
    cmd = [
        sys.executable,
        "train_yolov3.py",
        "--dataset=voc",
        f"--dataset_root={voc_tree}",
        "--batch_size=2",
        "--data_shape=96",
        "--no_random_shape",
        "--epochs=1",
        "--val_interval=0",
        "--save_interval=1",
        "--nopretrained_cnn",
        "--num_workers=1",
        "--log_interval=1",
        "--save_prefix=0000",
        f"--experiment_root={save_dir}",
    ]
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1200
    )
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-4000:]
    assert "samples/sec" in out
    # checkpoint written with the reference naming
    ckpts = [
        f
        for f in os.listdir(os.path.join(save_dir, "0000"))
        if f.endswith("_0000.params")
    ]
    assert ckpts, os.listdir(os.path.join(save_dir, "0000"))


def test_train_cli_preemption_checkpoints_and_exits_clean(voc_tree, tmp_path):
    """Graceful preemption: SIGTERM mid-training (the spot/preemptible TPU
    preemption notice) finishes the in-flight step, writes an epoch-named
    checkpoint that --start_epoch -1 auto-resumes from, and exits 0."""
    import signal
    import time

    save_dir = tmp_path / "exp"
    cmd = [
        sys.executable, "-u",
        "train_yolov3.py",
        "--dataset=voc",
        f"--dataset_root={voc_tree}",
        "--batch_size=2",
        "--data_shape=96",
        "--no_random_shape",
        "--epochs=500",  # far more than can run; preemption must end it
        "--val_interval=0",
        "--save_interval=0",  # nothing saved on the normal path
        "--nopretrained_cnn",
        "--num_workers=1",
        "--log_interval=1",
        "--save_prefix=0000",
        f"--experiment_root={save_dir}",
    ]
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    p = subprocess.Popen(
        cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait until training has demonstrably stepped (first batch line),
        # then deliver the preemption signal
        deadline = time.time() + 900
        lines = []
        for line in p.stdout:
            lines.append(line)
            if "[Batch" in line or time.time() > deadline:
                break
        assert any("[Batch" in l for l in lines), "".join(lines)[-4000:]
        p.send_signal(signal.SIGTERM)
        rest, _ = p.communicate(timeout=300)
    finally:
        if p.poll() is None:
            p.kill()
    out = "".join(lines) + rest
    assert p.returncode == 0, out[-4000:]
    assert "Preempted: wrote" in out, out[-4000:]
    ckpts = [
        f
        for f in os.listdir(os.path.join(save_dir, "0000"))
        if f.endswith(".params") and "_best" not in f
    ]
    assert ckpts, os.listdir(os.path.join(save_dir, "0000"))


@pytest.fixture(scope="module")
def vid_tree(tmp_path_factory):
    """Synthetic ImageNet-VID layout: one val==train clip, 6 frames."""
    import cv2

    from videoyolo_tpu.data.base import load_names

    wn = load_names("imagenetvid_wn")
    root = tmp_path_factory.mktemp("data_root")
    base = root / "ImageNetVID" / "ILSVRC"
    (base / "ImageSets" / "VID").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        clip = f"ILSVRC2017_{split}_00000000"
        (base / "Data" / "VID" / split / clip).mkdir(parents=True)
        (base / "Annotations" / "VID" / split / clip).mkdir(parents=True)
        lines = []
        for f in range(6):
            fname = f"{f:06d}"
            cv2.imwrite(
                str(base / "Data" / "VID" / split / clip / f"{fname}.JPEG"),
                rng.randint(0, 255, (96, 128, 3), np.uint8),
            )
            x1 = 10 + 2 * f
            (base / "Annotations" / "VID" / split / clip / f"{fname}.xml").write_text(
                "<annotation><size><width>128</width><height>96</height></size>"
                f"<object><name>{wn[0]}</name><trackid>0</trackid>"
                f"<bndbox><xmax>{x1 + 40}</xmax><xmin>{x1}</xmin>"
                "<ymax>80</ymax><ymin>30</ymin></bndbox></object></annotation>"
            )
            lines.append(f"{clip}/{fname} {f + 1}")
        (base / "ImageSets" / "VID" / f"{split}.txt").write_text("\n".join(lines))
    return str(root)


def test_train_cli_vid_mult_out_temporal_validation(vid_tree, tmp_path):
    """--temp --mult_out trains the t=5 per-frame-output model AND validates
    through the per-timestep VOCMApMetricTemporal (reference get_dataset
    :207-211: vid val + mult_out selects the temporal metric; validate
    streams each offset separately instead of folding T into the batch)."""
    save_dir = tmp_path / "exp"
    cmd = [
        sys.executable,
        "train_yolov3.py",
        "--dataset=vid",
        f"--dataset_root={vid_tree}",
        "--batch_size=1",
        "--data_shape=64",
        "--no_random_shape",
        "--epochs=1",
        "--val_interval=1",
        "--save_interval=0",
        "--every=1",
        "--window=5,1",
        "--temp",
        "--mult_out",
        "--nopretrained_cnn",
        "--num_workers=1",
        "--log_interval=1",
        "--save_prefix=0000",
        f"--experiment_root={save_dir}",
    ]
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_COMPILATION_CACHE_DIR=cpu_cache_dir(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=3000
    )
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-4000:]
    # per-offset metric rows prove VOCMApMetricTemporal ran
    assert "t0:" in out and "t4:" in out, out[-4000:]
