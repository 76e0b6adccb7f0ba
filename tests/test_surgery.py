"""reset_class weight surgery (reference yolo3.py:76-129, :558-630)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoyolo_tpu.models.surgery import reset_class, resolve_reuse_map
from videoyolo_tpu.models.yolo3 import YOLOv3

OLD = ["cat", "dog", "bird"]
NEW = ["person", "dog"]


def test_resolve_reuse_map_variants():
    assert resolve_reuse_map({"dog": "dog"}, OLD, NEW) == {1: 1}
    assert resolve_reuse_map({1: 1}, OLD, NEW) == {1: 1}
    assert resolve_reuse_map({"dog": 1}, OLD, NEW) == {1: 1}
    assert resolve_reuse_map(["dog", "zebra"], OLD, NEW) == {1: 1}
    assert resolve_reuse_map(None, OLD, NEW) is None
    with pytest.raises(ValueError):
        resolve_reuse_map({"dog": "zebra"}, OLD, NEW)
    with pytest.raises(ValueError):
        resolve_reuse_map({"zebra": "dog"}, OLD, NEW)


def test_reset_class_copies_per_anchor_rows():
    m_old = YOLOv3(num_classes=len(OLD))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v_old = m_old.init(jax.random.PRNGKey(1), x, train=False)
    v_new = reset_class(v_old, OLD, NEW, reuse_weights={"dog": "dog"})

    m_new = YOLOv3(num_classes=len(NEW))
    b, s = m_new.apply(v_new, x, train=False)
    assert s.shape[-1] == len(NEW)

    ko = np.asarray(v_old["params"]["output0"]["prediction"]["kernel"])
    kn = np.asarray(v_new["params"]["output0"]["prediction"]["kernel"])
    old_pred, new_pred = 5 + len(OLD), 5 + len(NEW)
    for a in range(3):  # per-anchor block copies (yolo3.py:119-127)
        oo, on = a * old_pred, a * new_pred
        np.testing.assert_allclose(kn[..., on : on + 5], ko[..., oo : oo + 5])
        np.testing.assert_allclose(kn[..., on + 5 + 1], ko[..., oo + 5 + 1])
        assert not np.allclose(kn[..., on + 5 + 0], ko[..., oo + 5 + 0])

    bo = np.asarray(v_old["params"]["output0"]["prediction"]["bias"])
    bn = np.asarray(v_new["params"]["output0"]["prediction"]["bias"])
    np.testing.assert_allclose(bn[:5], bo[:5])
    np.testing.assert_allclose(bn[5 + 1], bo[5 + 1])


def test_reset_class_no_reuse_reinitialises():
    m_old = YOLOv3(num_classes=len(OLD))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v_old = m_old.init(jax.random.PRNGKey(2), x, train=False)
    v_new = reset_class(v_old, OLD, NEW)
    kn = np.asarray(v_new["params"]["output0"]["prediction"]["kernel"])
    assert kn.shape[-1] == 3 * (5 + len(NEW))
    # backbone untouched
    tb = jax.tree_util.tree_leaves(v_old["params"]["backbone"])
    tn = jax.tree_util.tree_leaves(v_new["params"]["backbone"])
    for a, b in zip(tb, tn):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
