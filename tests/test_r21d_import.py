"""VMZ caffe2 .pkl -> flax R21D weight import (reference rdnet/utils.py:7-117)."""
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoyolo_tpu.models.r21d import r21d_34
from videoyolo_tpu.utils.r21d_import import load_vmz_r21d

LAYERS = (3, 4, 6, 3)


@pytest.fixture(scope="module")
def r21d_vars():
    m = r21d_34()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)), train=False)
    return m, v


def _synth_vmz(v, path):
    """Fabricate a VMZ-named blob dict shaped from the flax tree."""
    rs = np.random.RandomState(0)
    blobs = {}
    P, S = v["params"], v["batch_stats"]

    def bn(prefix, pnode, snode):
        blobs[prefix + "_s"] = rs.rand(*np.asarray(pnode["scale"]).shape).astype(np.float32)
        blobs[prefix + "_b"] = rs.rand(*np.asarray(pnode["bias"]).shape).astype(np.float32)
        blobs[prefix + "_rm"] = rs.rand(*np.asarray(snode["mean"]).shape).astype(np.float32)
        blobs[prefix + "_riv"] = rs.rand(*np.asarray(snode["var"]).shape).astype(np.float32)

    def conv(name, kern):
        k = np.asarray(kern)  # (T,H,W,in,out) -> caffe2 (out,in,T,H,W)
        blobs[name] = rs.rand(
            k.shape[4], k.shape[3], k.shape[0], k.shape[1], k.shape[2]
        ).astype(np.float32)

    conv("conv1_middle_w", P["init"]["spatial"]["kernel"])
    bn("conv1_middle_spatbn_relu", P["init"]["mid_bn"], S["init"]["mid_bn"])
    conv("conv1_w", P["init"]["temporal"]["kernel"])
    bn("conv1_spatbn_relu", P["init_bn"], S["init_bn"])
    comp, starts = 0, {}
    for si, nb in enumerate(LAYERS, start=1):
        starts[si] = comp
        for bi in range(1, nb + 1):
            nm = f"stage{si}_block{bi}"
            for j in (1, 2):
                conv(f"comp_{comp}_conv_{j}_middle_w", P[nm][f"conv{j}"]["spatial"]["kernel"])
                bn(f"comp_{comp}_spatbn_{j}_middle", P[nm][f"conv{j}"]["mid_bn"], S[nm][f"conv{j}"]["mid_bn"])
                conv(f"comp_{comp}_conv_{j}_w", P[nm][f"conv{j}"]["temporal"]["kernel"])
                bn(f"comp_{comp}_spatbn_{j}", P[nm][f"bn{j}"], S[nm][f"bn{j}"])
            if bi == 1 and "down" in P[nm]:
                sk = f"shortcut_projection_{starts[si]}"
                conv(sk + "_w", P[nm]["down"]["kernel"])
                bn(sk + "_spatbn", P[nm]["down_bn"], S[nm]["down_bn"])
            comp += 1
    blobs["last_out_L400_w"] = rs.rand(400, 512).astype(np.float32)
    blobs["last_out_L400_b"] = rs.rand(400).astype(np.float32)
    with open(path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    return blobs


def test_vmz_import(r21d_vars, tmp_path):
    m, v = r21d_vars
    path = str(tmp_path / "vmz.pkl")
    blobs = _synth_vmz(v, path)
    v2 = load_vmz_r21d(dict(v), path, 34)

    np.testing.assert_allclose(
        np.asarray(v2["params"]["init"]["spatial"]["kernel"]),
        np.transpose(blobs["conv1_middle_w"], (2, 3, 4, 1, 0)),
    )
    # stage-2 first block downsample is VMZ shortcut_projection_3 (34-layer)
    np.testing.assert_allclose(
        np.asarray(v2["params"]["stage2_block1"]["down"]["kernel"]),
        np.transpose(blobs["shortcut_projection_3_w"], (2, 3, 4, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(v2["batch_stats"]["stage4_block3"]["bn2"]["mean"]),
        blobs["comp_15_spatbn_2_rm"],
    )
    np.testing.assert_allclose(
        np.asarray(v2["params"]["dense"]["kernel"]), blobs["last_out_L400_w"].T
    )
    out = m.apply(v2, jnp.zeros((1, 4, 32, 32, 3)), train=False)
    assert out[2].shape == (1, 400)
