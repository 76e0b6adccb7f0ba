"""FlowNet inference helpers, flow visualisation, and weight import.

Capability parity with `/root/reference/models/definitions/flownet/
inference.py` (`process_two_images` :10, `process_imagedir` :53,
`process_video` :90) and `flownet/utils.py` (crop/normalise :85-120,
Middlebury color wheel + flow->RGB :122-215, `writeFlow` .flo export
:216-248, torch checkpoint conversion :13-83).

The torch importer maps NVIDIA FlowNet2-S/C checkpoint tensors into this
framework's flax param tree (OIHW conv -> HWIO, deconv -> flax ConvTranspose
layout), replacing the reference's gluon `.params` conversion.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

UNKNOWN_FLOW_THRESH = 1e7

# --- pre/post processing (flownet/utils.py:85-120) -------------------------


def crop_to_64(imgs: np.ndarray) -> np.ndarray:
    """Centre-crop H and W to multiples of 64 (the encoder's stride)."""
    h, w = imgs.shape[-3:-1]
    h64, w64 = (h // 64) * 64, (w // 64) * 64
    y0, x0 = (h - h64) // 2, (w - w64) // 2
    return imgs[..., y0 : y0 + h64, x0 : x0 + w64, :]


def normalise_pair(imgs: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float in the FlowNet2 training range (mean-subtracted
    /255)."""
    imgs = imgs.astype(np.float32) / 255.0
    return imgs - imgs.mean(axis=(-3, -2), keepdims=True)


# --- inference (flownet/inference.py) ---------------------------------------


def process_two_images(model, variables, img1: np.ndarray, img2: np.ndarray):
    """Run flow between two HWC uint8 RGB frames -> (H/4, W/4, 2) flow."""
    import jax.numpy as jnp

    pair = np.stack([img1, img2])
    pair = crop_to_64(pair)
    pair = normalise_pair(pair)
    x = jnp.asarray(pair)[None]  # (1, 2, H, W, 3)
    flow = model.apply(variables, x)
    return np.asarray(flow[0])


def process_imagedir(model, variables, input_dir, output_dir=None):
    """Flow between consecutive frames of a directory; saves .flo + .png."""
    from ..data.base import read_image

    files = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    output_dir = output_dir or os.path.join(input_dir, "flow")
    os.makedirs(output_dir, exist_ok=True)
    outs = []
    for a, b in zip(files, files[1:]):
        flow = process_two_images(model, variables, read_image(a), read_image(b))
        stem = os.path.splitext(os.path.basename(a))[0]
        write_flo(os.path.join(output_dir, stem + ".flo"), flow)
        img = flow_to_image(flow)
        try:
            import cv2

            cv2.imwrite(os.path.join(output_dir, stem + ".png"), img[:, :, ::-1])
        except ImportError:
            pass
        outs.append(flow)
    return outs


def process_video(model, variables, input_path, output_dir=None, every: int = 1):
    """Flow between consecutive (every-nth) frames of a video file."""
    import cv2

    cap = cv2.VideoCapture(input_path)
    output_dir = output_dir or os.path.splitext(input_path)[0] + "_flow"
    os.makedirs(output_dir, exist_ok=True)
    prev, i, outs = None, 0, []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % every == 0:
            rgb = frame[:, :, ::-1]
            if prev is not None:
                flow = process_two_images(model, variables, prev, rgb)
                write_flo(os.path.join(output_dir, f"{i:06d}.flo"), flow)
                outs.append(flow)
            prev = rgb
        i += 1
    cap.release()
    return outs


# --- Middlebury flow colouring (flownet/utils.py:122-215, :294-331) ---------


def make_color_wheel() -> np.ndarray:
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[:RY, 0] = 255
    wheel[:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    wheel = make_color_wheel()
    ncols = wheel.shape[0]
    nan = np.isnan(u) | np.isnan(v)
    u, v = np.nan_to_num(u), np.nan_to_num(v)
    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = (fk - k0)[..., None]
    col0 = wheel[k0] / 255.0
    col1 = wheel[k1] / 255.0
    col = (1 - f) * col0 + f * col1
    idx = rad <= 1
    col[idx] = 1 - rad[idx, None] * (1 - col[idx])
    col[~idx] *= 0.75
    col[nan] = 0
    return np.floor(255 * col).astype(np.uint8)


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """(H, W, 2) flow -> RGB uint8 (flownet/utils.py:294-331)."""
    u, v = flow[..., 0].copy(), flow[..., 1].copy()
    bad = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (np.abs(v) > UNKNOWN_FLOW_THRESH)
    u[bad] = 0
    v[bad] = 0
    rad = np.sqrt(u**2 + v**2)
    maxrad = max(-1.0, float(rad.max()))
    u = u / (maxrad + np.finfo(float).eps)
    v = v / (maxrad + np.finfo(float).eps)
    img = compute_color(u, v)
    img[bad] = 0
    return img


def write_flo(filename: str, flow: np.ndarray):
    """Middlebury .flo export (flownet/utils.py:216-248)."""
    assert flow.ndim == 3 and flow.shape[2] == 2
    with open(filename, "wb") as f:
        np.float32(202021.25).tofile(f)  # magic
        np.int32(flow.shape[1]).tofile(f)
        np.int32(flow.shape[0]).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_flo(filename: str) -> np.ndarray:
    with open(filename, "rb") as f:
        magic = np.fromfile(f, np.float32, 1)[0]
        assert abs(magic - 202021.25) < 1e-3, "bad .flo magic"
        w = int(np.fromfile(f, np.int32, 1)[0])
        h = int(np.fromfile(f, np.int32, 1)[0])
        return np.fromfile(f, np.float32, h * w * 2).reshape(h, w, 2)


# --- torch checkpoint import (flownet/utils.py:13-83) -----------------------

_ENC_CONVS = {
    "conv1": "conv1", "conv2": "conv2", "conv3": "conv3", "conv3_1": "conv3_1",
    "conv4": "conv4", "conv4_1": "conv4_1", "conv5": "conv5", "conv5_1": "conv5_1",
    "conv6": "conv6", "conv6_1": "conv6_1",
}
_DEC = {
    "predict_flow6": "predict_flow6", "predict_flow5": "predict_flow5",
    "predict_flow4": "predict_flow4", "predict_flow3": "predict_flow3",
    "predict_flow2": "predict_flow2",
    "deconv5": "deconv5", "deconv4": "deconv4", "deconv3": "deconv3",
    "deconv2": "deconv2",
    "upsampled_flow6_to_5": "upsampled_flow6_to_5",
    "upsampled_flow5_to_4": "upsampled_flow5_to_4",
    "upsampled_flow4_to_3": "upsampled_flow4_to_3",
    "upsampled_flow3_to_2": "upsampled_flow3_to_2",
}


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_to_hwio(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight is (in, out, kh, kw); flax ConvTranspose
    # expects (kh, kw, in, out) with spatially-flipped kernels
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def convert_torch_flownet(load_path: str, variables: Dict) -> Dict:
    """Map an NVIDIA FlowNet2-S checkpoint (.pth) onto FlowNetS variables.

    Returns a new variables dict; raises KeyError listing anything missing.
    """
    import torch

    state = torch.load(load_path, map_location="cpu", weights_only=False)
    state = state.get("state_dict", state)
    state = {k: v.numpy() for k, v in state.items()}

    params = {"encoder": {}, "decoder": {}}
    for torch_name, ours in _ENC_CONVS.items():
        # torch modules are Sequential(conv, leaky): weights at '<n>.0.weight'
        w = state[f"{torch_name}.0.weight"]
        b = state[f"{torch_name}.0.bias"]
        params["encoder"][ours] = {"kernel": _oihw_to_hwio(w), "bias": b}
    for torch_name, ours in _DEC.items():
        prefix = torch_name if f"{torch_name}.weight" in state else f"{torch_name}.0"
        w = state[f"{prefix}.weight"]
        entry = {}
        if "deconv" in torch_name or "upsampled" in torch_name:
            entry["kernel"] = _deconv_to_hwio(w)
        else:
            entry["kernel"] = _oihw_to_hwio(w)
        if f"{prefix}.bias" in state:
            entry["bias"] = state[f"{prefix}.bias"]
        params["decoder"][ours] = entry

    import jax

    out = dict(variables)
    new_params = jax.tree_util.tree_map(lambda x: x, dict(out["params"]))
    for scope in ("encoder", "decoder"):
        tgt = dict(new_params[scope])
        for name, entry in params[scope].items():
            cur = dict(tgt.get(name, {}))
            for k, v in entry.items():
                assert (
                    k in cur and cur[k].shape == v.shape
                ), f"{scope}/{name}/{k}: {v.shape} vs {cur.get(k) is not None and cur[k].shape}"
                cur[k] = np.asarray(v, dtype=np.asarray(cur[k]).dtype)
            tgt[name] = cur
        new_params[scope] = tgt
    out["params"] = new_params
    return out
