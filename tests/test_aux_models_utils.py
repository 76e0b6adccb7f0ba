"""MobileNet V1/V2 extract backbones + process_logs parser — the last
reference components without direct tests (mobilenet/mobilenet.py,
utils/process_logs.py:7-45)."""
import jax
import jax.numpy as jnp
import numpy as np

from videoyolo_tpu.models.mobilenet import get_mobilenet
from videoyolo_tpu.utils.process_logs import display_stats, extract_stats


def test_mobilenet_v1_routes():
    model = get_mobilenet(version=1, return_features=True)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    r1, r2, r3 = model.apply(variables, x, train=False)
    # extract_base_features route contract: strides 8/16/32
    assert r1.shape[1:3] == (12, 12)
    assert r2.shape[1:3] == (6, 6)
    assert r3.shape[1:3] == (3, 3)


def test_mobilenet_v2_routes():
    model = get_mobilenet(version=2, multiplier=0.5, return_features=True)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    r1, r2, r3 = model.apply(variables, x, train=False)
    assert r1.shape[1:3] == (12, 12)
    assert r2.shape[1:3] == (6, 6)
    assert r3.shape[1:3] == (3, 3)
    assert np.isfinite(np.asarray(r3)).all()


def test_process_logs_roundtrip(tmp_path):
    """Parser over the exact line formats train_yolov3.py logs (verified
    against a real v5e run's train log)."""
    log = tmp_path / "run_train.log"
    log.write_text(
        "I0817 train_yolov3.py:503] [Epoch 0][Batch 0], LR: 1.00E-03, "
        "Speed: 23.1 samples/sec, ObjLoss=8202.781, BoxCenterLoss=2.375, "
        "BoxScaleLoss=1.431, ClassLoss=15.447\n"
        "I0817 train_yolov3.py:503] [Epoch 0][Batch 1], LR: 1.00E-03, "
        "Speed: 24.0 samples/sec, ObjLoss=14.906, BoxCenterLoss=2.959, "
        "BoxScaleLoss=1.957, ClassLoss=15.103\n"
        "I0817 train_yolov3.py:518] [Epoch 0] done in 104.3s, 0.153 samples/sec\n"
        "I0817 train_yolov3.py:528] [Epoch 0] Validation: \n"
        "dog=0.5\n"
        "mAP=0.25\n"
        "I0817 train_yolov3.py:503] [Epoch 1][Batch 0], LR: 9.00E-04, "
        "Speed: 25.0 samples/sec, ObjLoss=10.0, BoxCenterLoss=2.0, "
        "BoxScaleLoss=1.5, ClassLoss=12.0\n"
    )
    stats = extract_stats(str(log))
    assert stats[0]["ObjLoss"] == 14.906  # last interval of the epoch wins
    assert stats[0]["mAP"] == 0.25
    assert stats[1]["ClassLoss"] == 12.0
    table = display_stats(stats)
    assert "\t" in table and "mAP" in table
