"""Space-to-depth stem: Darknet53(s2d_stem=True) with refolded weights must
be numerically equivalent to the standard stem (reference darknet.py:132-133
semantics; refold math in models/s2d.py)."""
import numpy as np
import pytest

from videoyolo_tpu.models.darknet import Darknet53, space_to_depth
from videoyolo_tpu.models.s2d import refold_conv0, refold_down1, refold_stem_s2d

SMALL = dict(layers=(1, 1, 1, 1, 1), channels=(8, 16, 32, 64, 128, 256))


def test_space_to_depth_layout():
    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    y = np.asarray(space_to_depth(x))
    assert y.shape == (2, 2, 2, 12)
    # channel (p*2+q)*C + c picks pixel (2a+p, 2b+q)
    np.testing.assert_array_equal(y[0, 0, 0, 0:3], x[0, 0, 0])      # p=q=0
    np.testing.assert_array_equal(y[0, 0, 0, 3:6], x[0, 0, 1])      # q=1
    np.testing.assert_array_equal(y[0, 0, 0, 6:9], x[0, 1, 0])      # p=1
    np.testing.assert_array_equal(y[0, 1, 1, 9:12], x[0, 3, 3])     # p=q=1


def test_refold_shapes_and_tap_placement():
    w0 = np.random.RandomState(0).randn(3, 3, 3, 8).astype(np.float32)
    r0 = refold_conv0(w0)
    assert r0.shape == (3, 3, 12, 32)
    # centre tap of output phase (0,0) reads input phase (0,0) at offset 0
    np.testing.assert_array_equal(r0[1, 1, 0:3, 0:8], w0[1, 1])
    w1 = np.random.RandomState(1).randn(3, 3, 8, 16).astype(np.float32)
    r1 = refold_down1(w1)
    assert r1.shape == (2, 2, 32, 16)
    # di=0 -> row-offset 0 (kernel index 1), phase 0
    np.testing.assert_array_equal(r1[1, 1, 0:8], w1[1, 1])
    # di=-1 -> row-offset -1 (kernel index 0), phase 1
    np.testing.assert_array_equal(r1[0, 0, (1 * 2 + 1) * 8 : (1 * 2 + 2) * 8], w1[0, 0])


@pytest.fixture(scope="module")
def std_and_s2d():
    import jax
    import jax.numpy as jnp

    std = Darknet53(**SMALL)
    s2d = Darknet53(s2d_stem=True, **SMALL)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3), jnp.float32)
    v = std.init(jax.random.PRNGKey(0), x, train=False)
    vs = refold_stem_s2d(dict(v))
    return std, s2d, v, vs, x


def test_s2d_stem_equivalent_eval(std_and_s2d):
    std, s2d, v, vs, x = std_and_s2d
    r_std = std.apply(v, x, train=False)
    r_s2d = s2d.apply(vs, x, train=False)
    for a, b in zip(r_std, r_s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_s2d_stem_equivalent_train_stats(std_and_s2d):
    """Train mode too: ConvBNLeakyS2D pools BN statistics across the 4
    phases, so batch stats evolve exactly like the standard conv0's."""
    std, s2d, v, vs, x = std_and_s2d
    r1, m1 = std.apply(v, x, train=True, mutable=["batch_stats"])
    r2, m2 = s2d.apply(vs, x, train=True, mutable=["batch_stats"])
    # stem-level batch stats agree to float-reassociation noise (~1e-8);
    # dividing by batch variance amplifies that through 11 BN layers, so the
    # deep outputs get a looser tolerance (measured ~5e-3 max)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)
    s1 = m1["batch_stats"]["conv0"]["BatchNorm_0"]
    s2 = m2["batch_stats"]["conv0"]["BatchNorm_0"]
    np.testing.assert_allclose(np.asarray(s1["mean"]), np.asarray(s2["mean"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1["var"]), np.asarray(s2["var"]), atol=1e-6)


def test_s2d_through_full_model():
    """yolo3_darknet53(s2d_stem=True) with refolded backbone = standard model
    detections."""
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.models.factory import yolo3_darknet53

    std = yolo3_darknet53(3)
    s2d = yolo3_darknet53(3, s2d_stem=True)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)
    v = std.init(jax.random.PRNGKey(1), x, train=False)
    vs = refold_stem_s2d(dict(v), prefix="backbone")
    b1, s1 = std.apply(v, x, train=False)
    b2, s2 = s2d.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)


def test_pad_stem_equivalent():
    """Darknet53(pad_stem=True) with a zero-padded conv0 kernel is bit-
    equivalent to the standard stem (the 4th input channel is all zeros);
    also through the full detector and the int8 quantised path."""
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.models.s2d import pad_stem_cin

    std = Darknet53(**SMALL)
    pad = Darknet53(pad_stem=True, **SMALL)
    x = jnp.asarray(np.random.RandomState(4).rand(2, 32, 32, 3), jnp.float32)
    v = std.init(jax.random.PRNGKey(0), x, train=False)
    vp = pad_stem_cin(dict(v))
    assert np.asarray(vp["params"]["conv0"]["Conv_0"]["kernel"]).shape[2] == 4
    for a, b in zip(std.apply(v, x, train=False), pad.apply(vp, x, train=False)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pad_stem_through_full_model_and_int8():
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.models.factory import yolo3_darknet53
    from videoyolo_tpu.models.s2d import pad_stem_cin
    from videoyolo_tpu.ops.quantize import quantize_static

    std = yolo3_darknet53(3)
    pad = yolo3_darknet53(3, pad_stem=True)
    x = jnp.asarray(np.random.RandomState(5).rand(1, 64, 64, 3), jnp.float32)
    v = std.init(jax.random.PRNGKey(1), x, train=False)
    vp = pad_stem_cin(dict(v), prefix="backbone")
    b1, s1 = std.apply(v, x, train=False)
    b2, s2 = pad.apply(vp, x, train=False)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    # int8 serving path accepts the 4-channel stem kernel
    qm, qv = quantize_static(pad, vp, [np.asarray(x, np.float32)])
    qb, qs = qm.apply(qv, x, train=False)
    corr = np.corrcoef(np.asarray(s2).ravel(), np.asarray(qs).ravel())[0, 1]
    assert np.isfinite(np.asarray(qb)).all() and corr > 0.99, corr
