"""2D -> 3D/2+1D weight inflation (reference three_darknet.py:274-318 and
its repeated-frame consistency probe :335-347)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoyolo_tpu.models.darknet import Darknet53
from videoyolo_tpu.models.darknet3d import Darknet3D
from videoyolo_tpu.models.inflate import inflate_darknet53_to_3d

S, T = 32, 5


@pytest.fixture(scope="module")
def darknet2d():
    m = Darknet53()
    v = m.init(jax.random.PRNGKey(3), jnp.zeros((1, S, S, 3)), train=False)
    return m, v


def test_inflate_21d_exact_on_repeated_frames(darknet2d):
    """The 2+1D inflation (spatial copy + uniform temporal + repeat-pad)
    preserves the 2D computation on a static clip up to fp accumulation:
    the uniform temporal kernel computes (x+x+x)/3 which reassociates
    differently from x, drifting ~1e-2 over 52 layers (the reference
    documents the same 'minor differences', rdnet/README.md)."""
    m2, v2 = darknet2d
    conv_types = (21, 21, 21, 21, 21, 21)
    m3 = Darknet3D(conv_types=conv_types)
    x1 = jnp.asarray(np.random.RandomState(0).rand(1, S, S, 3), jnp.float32)
    xT = jnp.repeat(x1[:, None], T, axis=1)
    v3 = m3.init(jax.random.PRNGKey(4), xT, train=False)
    v3 = inflate_darknet53_to_3d(v2, v3, conv_types)

    r2 = m2.apply(v2, x1, train=False)
    r3 = m3.apply(v3, xT, train=False)
    for a, b in zip(r2, r3):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=0.05)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_inflate_3d_close_on_repeated_frames(darknet2d):
    """Full-3D inflation (repeat/tau) matches on interior frames; the final
    temporal max keeps routes close to the 2D net (zero temporal padding
    attenuates only the boundary frames)."""
    m2, v2 = darknet2d
    conv_types = (2, 3, 3, 2, 2, 2)
    m3 = Darknet3D(conv_types=conv_types)
    x1 = jnp.asarray(np.random.RandomState(1).rand(1, S, S, 3), jnp.float32)
    xT = jnp.repeat(x1[:, None], T, axis=1)
    v3 = m3.init(jax.random.PRNGKey(5), xT, train=False)
    v3 = inflate_darknet53_to_3d(v2, v3, conv_types)

    r2 = m2.apply(v2, x1, train=False)
    r3 = m3.apply(v3, xT, train=False)
    for a, b in zip(r2, r3):
        a, b = np.asarray(a), np.asarray(b)
        # temporal max over {exact interior, attenuated boundary} >= ... with
        # leaky negatives it can deviate slightly; demand high correlation
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.99, corr


def test_inflate_mixed_2d_stages_identical(darknet2d):
    """Stages declared conv_type 2 must carry the 2D weights verbatim."""
    m2, v2 = darknet2d
    conv_types = (2, 2, 21, 2, 2, 2)
    m3 = Darknet3D(conv_types=conv_types)
    xT = jnp.zeros((1, 3, S, S, 3))
    v3 = m3.init(jax.random.PRNGKey(6), xT, train=False)
    v3 = inflate_darknet53_to_3d(v2, v3, conv_types)
    np.testing.assert_array_equal(
        np.asarray(v3["params"]["stem"]["ConvBNLeaky_0"]["Conv_0"]["kernel"]),
        np.asarray(v2["params"]["conv0"]["Conv_0"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(
            v3["params"]["stage4_block0"]["_Unit_0"]["ConvBNLeaky_0"]["Conv_0"]["kernel"]
        ),
        np.asarray(
            v2["params"]["stage5"]["DarknetBasicBlock_0"]["ConvBNLeaky_0"]["Conv_0"]["kernel"]
        ),
    )
