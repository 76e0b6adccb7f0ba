"""FlowNet inference helpers: .flo IO, Middlebury colouring, torch
checkpoint import, two-image inference (reference flownet/inference.py,
flownet/utils.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from videoyolo_tpu.models import flownet_utils as fu
from videoyolo_tpu.models.flownet import FlowNetS


def test_flo_roundtrip_and_colouring(tmp_path):
    flow = np.random.RandomState(0).randn(20, 30, 2).astype(np.float32)
    img = fu.flow_to_image(flow)
    assert img.shape == (20, 30, 3) and img.dtype == np.uint8
    p = str(tmp_path / "t.flo")
    fu.write_flo(p, flow)
    np.testing.assert_array_equal(fu.read_flo(p), flow)


def test_crop_and_normalise():
    imgs = np.random.RandomState(0).randint(0, 255, (2, 130, 200, 3), np.uint8)
    c = fu.crop_to_64(imgs)
    assert c.shape == (2, 128, 192, 3)
    n = fu.normalise_pair(c)
    assert abs(float(n.mean())) < 1e-5  # per-image mean removed


def test_torch_import_roundtrip(tmp_path):
    import torch

    m = FlowNetS()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)))
    state = {}
    for name, p in v["params"]["encoder"].items():
        k = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
        state[f"{name}.0.weight"] = torch.tensor(np.ascontiguousarray(k))
        state[f"{name}.0.bias"] = torch.tensor(np.asarray(p["bias"]))
    for name, p in v["params"]["decoder"].items():
        kern = np.asarray(p["kernel"])
        if "deconv" in name or "upsampled" in name:
            k = np.transpose(kern[::-1, ::-1], (2, 3, 0, 1))
        else:
            k = np.transpose(kern, (3, 2, 0, 1))
        state[f"{name}.0.weight"] = torch.tensor(np.ascontiguousarray(k))
        if "bias" in p:
            state[f"{name}.0.bias"] = torch.tensor(np.asarray(p["bias"]))
    path = str(tmp_path / "fake_flownet.pth")
    torch.save({"state_dict": state}, path)

    v2 = fu.convert_torch_flownet(path, dict(v))
    for scope in ("encoder", "decoder"):
        for name, p in v["params"][scope].items():
            for k in p:
                np.testing.assert_allclose(
                    np.asarray(p[k]),
                    np.asarray(v2["params"][scope][name][k]),
                    err_msg=f"{scope}/{name}/{k}",
                )


def test_process_two_images():
    m = FlowNetS()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)))
    rs = np.random.RandomState(1)
    flow = fu.process_two_images(
        m, v, rs.randint(0, 255, (80, 96, 3), np.uint8),
        rs.randint(0, 255, (80, 96, 3), np.uint8),
    )
    assert flow.shape == (16, 16, 2)  # stride-4 flow2 on the 64-cropped input
