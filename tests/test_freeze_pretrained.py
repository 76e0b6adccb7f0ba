"""--freeze_base / --pretrained_cnn wiring (reference wrappers.py:50-57
grad_req='null' freezing; train_yolov3.py:351 pretrained_base default)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tree(v):
    return {
        "backbone": {"conv0": {"kernel": np.full((3, 3), v, np.float32)}},
        "stage1": {"w": np.full((2,), v, np.float32)},
        "block0": {"Conv_0": {"kernel": np.full((4,), v, np.float32)}},
        "output0": {"prediction": {"bias": np.full((5,), v, np.float32)}},
    }


def test_freeze_base_mask_marks_base_scopes():
    from videoyolo_tpu.train.step import freeze_base_mask

    mask = freeze_base_mask(_tree(1.0))
    assert mask["backbone"]["conv0"]["kernel"] is True
    assert mask["stage1"]["w"] is True
    assert mask["block0"]["Conv_0"]["kernel"] is False
    assert mask["output0"]["prediction"]["bias"] is False


def test_freeze_base_optimizer_freezes_backbone_only():
    import jax
    import optax

    from videoyolo_tpu.train.step import make_optimizer

    params = _tree(1.0)
    grads = _tree(0.5)
    tx = make_optimizer(lambda s: 0.1, freeze_base=True)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    # frozen: base params identical (wd + momentum contributions zeroed too)
    np.testing.assert_array_equal(
        new["backbone"]["conv0"]["kernel"], params["backbone"]["conv0"]["kernel"]
    )
    np.testing.assert_array_equal(new["stage1"]["w"], params["stage1"]["w"])
    # head params moved
    assert not np.allclose(
        new["block0"]["Conv_0"]["kernel"], params["block0"]["Conv_0"]["kernel"]
    )
    assert not np.allclose(
        new["output0"]["prediction"]["bias"], params["output0"]["prediction"]["bias"]
    )


def test_pretrained_cnn_fails_loudly_without_weights(tmp_path):
    """Default --pretrained_cnn must not silently train from a random base
    (round-1 regression): with no weights findable it raises with a
    pointer to --nopretrained_cnn."""
    code = (
        "import train_yolov3 as t\n"
        "t.FLAGS(['t', '--dataset_root=%s'])\n"
        "assert t._find_pretrained_base() is None\n"
        "try:\n"
        "    t._load_pretrained_base({'params': {}}, ['2']*6, None, 0)\n"
        "except RuntimeError as e:\n"
        "    assert 'nopretrained_cnn' in str(e)\n"
        "else:\n"
        "    raise SystemExit('expected RuntimeError')\n" % tmp_path
    )
    env = dict(os.environ, MXNET_HOME=str(tmp_path))
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr


def test_pretrained_cnn_resolves_and_loads(tmp_path):
    """A darknet53*.params in <dataset_root>/weights is found and loaded into
    the model's backbone scope (spot-check one kernel)."""
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.models.darknet import Darknet53
    from videoyolo_tpu.utils.gluon_import import (
        load_gluon_darknet53,
        write_mxnet_params,
    )
    from tests.test_gluon_import import _fake_gluon_darknet

    m = Darknet53()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    wdir = tmp_path / "weights"
    wdir.mkdir()
    path, gluon = _fake_gluon_darknet(v, wdir)

    # resolution logic (subprocess: train_yolov3 defines absl flags that
    # would collide with detect_yolo3 imported by other test files)
    code = (
        "import train_yolov3 as t\n"
        "t.FLAGS(['t', '--dataset_root=%s'])\n"
        "p = t._find_pretrained_base()\n"
        "assert p and p.endswith('.params'), p\n" % tmp_path
    )
    env = dict(os.environ, MXNET_HOME=str(tmp_path / "nonexistent"))
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

    # load into a full-model-style tree: backbone scope
    full = {"params": {"backbone": v["params"]}, "batch_stats": {"backbone": v["batch_stats"]}}
    loaded = load_gluon_darknet53(full, path, prefix="backbone")
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["backbone"]["conv0"]["Conv_0"]["kernel"]),
        np.transpose(gluon["darknetv30_conv0_weight"], (2, 3, 1, 0)),
    )


def test_fast_forward_schedule_resumes_decayed_lr():
    """Resume must continue the LR schedule from the global step, not replay
    warmup (round-1: fresh opt_state restarted the schedule while the log
    reported the offset LR)."""
    import optax

    from videoyolo_tpu.train.step import fast_forward_schedule, make_optimizer

    sched = lambda step: np.where(step < 100, 1.0, 0.1)
    tx = make_optimizer(sched, momentum=0.0, weight_decay=0.0)
    params = {"w": np.zeros(3, np.float32)}
    grads = {"w": np.ones(3, np.float32)}

    fresh = tx.init(params)
    upd, _ = tx.update(grads, fresh, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), -1.0)  # warmup-phase LR

    ff = fast_forward_schedule(tx.init(params), 200)
    upd, _ = tx.update(grads, ff, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), -0.1)  # decayed LR
