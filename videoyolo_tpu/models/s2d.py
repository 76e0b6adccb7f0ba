"""Stem weight refolding: space-to-depth, and input-channel padding.

The standard Darknet53 stem (reference darknet.py:132-133 conv0 + the first
downsample) runs at 24% MFU on TPU: a stride-1 3x3 conv with contraction
dim 27 and 32 output channels tiles poorly onto the 128x128 MXU while
touching the full 416^2 image.  `Darknet53(s2d_stem=True)` evaluates the
SAME function on the space-to-depth grid:

  conv0  (3x3/s1,  3->32  @ HxW)    ->  3x3/s1 conv, 12->128 @ H/2 x W/2
  down1  (3x3/s2, 32->64)           ->  2x2/s1 conv, 128->64, pad (1,0)

Both refolded kernels contain the original taps rearranged per spatial
phase (zeros where a tap falls outside a phase's window), so outputs are
bit-equivalent modulo float reassociation.  This module provides the weight
mapping so standard checkpoints / ImageNet-pretrained weights drive the
s2d model, and the inverse for exporting.

Derivation: for output phase (po, qo) and tap (di, dj) of conv0, the input
pixel (2a+po+di, 2b+qo+dj) lives at s2d row a + (po+di)//2, phase
(po+di)%2 — so every standard tap maps to exactly one (row-offset, phase)
slot of the refolded kernel.  The stride-2 down1 has po=qo=0 only and its
row offsets span {-1, 0}, hence the 2x2 kernel with top/left padding 1.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["refold_conv0", "refold_down1", "refold_stem_s2d", "pad_stem_cin"]


def refold_conv0(w: np.ndarray) -> np.ndarray:
    """(3, 3, C, F) stride-1 stem kernel -> (3, 3, 4C, 4F) s2d kernel."""
    k, _, c, f = w.shape
    assert k == 3
    out = np.zeros((3, 3, 4 * c, 4 * f), w.dtype)
    for po in (0, 1):
        for qo in (0, 1):
            for di in (-1, 0, 1):
                u, pi = (po + di) // 2, (po + di) % 2
                for dj in (-1, 0, 1):
                    v, qi = (qo + dj) // 2, (qo + dj) % 2
                    out[
                        u + 1, v + 1,
                        (pi * 2 + qi) * c : (pi * 2 + qi + 1) * c,
                        (po * 2 + qo) * f : (po * 2 + qo + 1) * f,
                    ] = w[di + 1, dj + 1]
    return out


def refold_down1(w: np.ndarray) -> np.ndarray:
    """(3, 3, C, F) stride-2 kernel -> (2, 2, 4C, F) s2d-input kernel."""
    k, _, c, f = w.shape
    assert k == 3
    out = np.zeros((2, 2, 4 * c, f), w.dtype)
    for di in (-1, 0, 1):
        u, pi = di // 2, di % 2  # -1 -> (-1, 1); 0 -> (0, 0); 1 -> (0, 1)
        for dj in (-1, 0, 1):
            v, qi = dj // 2, dj % 2
            out[u + 1, v + 1, (pi * 2 + qi) * c : (pi * 2 + qi + 1) * c] = w[
                di + 1, dj + 1
            ]
    return out


def _mutable(tree):
    if hasattr(tree, "items"):
        return {k: _mutable(v) for k, v in tree.items()}
    return tree


def pad_stem_cin(variables: Dict, prefix: str = "") -> Dict:
    """Standard Darknet53 variables -> Darknet53(pad_stem=True) variables.

    Only conv0's kernel changes: (3, 3, 3, F) -> (3, 3, 4, F) with a zero
    4th input-channel row.  The padded model zero-pads its RGB input to 4
    channels inside the graph, so the extra row never contributes — outputs
    are bit-equivalent modulo float accumulation order.  `prefix` as in
    `refold_stem_s2d`."""
    out = _mutable(dict(variables))
    root = out["params"][prefix] if prefix else out["params"]
    w0 = np.asarray(root["conv0"]["Conv_0"]["kernel"])
    k, _, c, f = w0.shape
    assert c == 3, w0.shape
    root["conv0"]["Conv_0"]["kernel"] = np.concatenate(
        [w0, np.zeros((k, k, 1, f), w0.dtype)], axis=2
    )
    return out


def refold_stem_s2d(variables: Dict, prefix: str = "") -> Dict:
    """Standard Darknet53 variables -> Darknet53(s2d_stem=True) variables.

    Only the conv0 kernel and stage1's downsample kernel change shape; BN
    params/stats carry over verbatim (ConvBNLeakyS2D keeps per-original-
    channel statistics).  `prefix` is the backbone scope ('' for a bare
    Darknet53, 'backbone' inside YOLOv3)."""
    out = _mutable(dict(variables))
    for coll in ("params",):
        root = out[coll][prefix] if prefix else out[coll]
        w0 = np.asarray(root["conv0"]["Conv_0"]["kernel"])
        root["conv0"]["Conv_0"]["kernel"] = refold_conv0(w0)
        w1 = np.asarray(root["stage1"]["ConvBNLeaky_0"]["Conv_0"]["kernel"])
        root["stage1"]["ConvBNLeaky_0"]["Conv_0"]["kernel"] = refold_down1(w1)
    return out
