"""MXNet .params container IO + gluon darknet53 weight mapping
(reference darknet/darknet.py:101 pretrained load; train_yolov3.py:289-329
checkpoint format)."""
import numpy as np
import pytest

from videoyolo_tpu.utils.gluon_import import (
    load_gluon_darknet53,
    read_mxnet_params,
    write_mxnet_params,
)


def test_params_container_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    params = {
        "a_weight": rs.rand(4, 3, 3, 3).astype(np.float32),
        "b_gamma": rs.rand(8).astype(np.float32),
        "c_int": np.arange(5, dtype=np.int64),
        "d_half": rs.rand(2, 2).astype(np.float16),
    }
    p = str(tmp_path / "t.params")
    write_mxnet_params(p, params)
    back = read_mxnet_params(p)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(back[k], params[k])
        assert back[k].dtype == params[k].dtype


@pytest.fixture(scope="module")
def darknet_vars():
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.models.darknet import Darknet53

    m = Darknet53()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    return m, v


def _fake_gluon_darknet(variables, tmp_path):
    """Build a gluon-named params file from the flax shapes (creation order
    matches gluon's conv0..51 numbering)."""
    rs = np.random.RandomState(1)
    out = {}
    ci = 0

    def walk(ptree, stree):
        nonlocal ci
        for key in ptree:
            psub = ptree[key]
            if "Conv_0" in psub:
                w = np.asarray(psub["Conv_0"]["kernel"])
                out[f"darknetv30_conv{ci}_weight"] = rs.rand(
                    w.shape[3], w.shape[2], w.shape[0], w.shape[1]
                ).astype(np.float32)
                c = w.shape[3]
                out[f"darknetv30_batchnorm{ci}_gamma"] = rs.rand(c).astype(np.float32)
                out[f"darknetv30_batchnorm{ci}_beta"] = rs.rand(c).astype(np.float32)
                out[f"darknetv30_batchnorm{ci}_running_mean"] = rs.rand(c).astype(np.float32)
                out[f"darknetv30_batchnorm{ci}_running_var"] = rs.rand(c).astype(np.float32)
                ci += 1
            elif hasattr(psub, "items"):
                walk(psub, None)

    walk(variables["params"], None)
    path = str(tmp_path / "darknet53.params")
    write_mxnet_params(path, out)
    return path, out


def test_load_gluon_darknet53(darknet_vars, tmp_path):
    import jax
    import jax.numpy as jnp

    model, v = darknet_vars
    path, gluon = _fake_gluon_darknet(v, tmp_path)
    loaded = load_gluon_darknet53(dict(v), path, prefix="")

    # spot checks: conv0 is gluon conv0 (OIHW->HWIO); first BN stats wired
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["conv0"]["Conv_0"]["kernel"]),
        np.transpose(gluon["darknetv30_conv0_weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(loaded["batch_stats"]["conv0"]["BatchNorm_0"]["mean"]),
        gluon["darknetv30_batchnorm0_running_mean"],
    )
    # last conv (51) lands on stage5 block3 expand
    np.testing.assert_allclose(
        np.asarray(
            loaded["params"]["stage5"]["DarknetBasicBlock_3"]["ConvBNLeaky_1"][
                "Conv_0"
            ]["kernel"]
        ),
        np.transpose(gluon["darknetv30_conv51_weight"], (2, 3, 1, 0)),
    )
    # the loaded tree still drives the model
    routes = model.apply(loaded, jnp.zeros((1, 32, 32, 3)), train=False)
    assert routes[-1].shape == (1, 1, 1, 1024)
