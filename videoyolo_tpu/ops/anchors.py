"""YOLOv3 anchor and grid-offset construction.

Capability parity with the anchor constants hardcoded in the reference model
factory (`/root/reference/models/definitions/yolo/wrappers.py:80-84`) and the
grid-offset constant buffers built in `YOLOOutputV3.__init__`
(`/root/reference/models/definitions/yolo/yolo3.py:66-75`).

TPU-first difference: offsets are not stored as oversized (128,128) "alloc
size" parameters to be `slice_like`'d at runtime — shapes are static under
jit, so we build exactly-sized grids per feature-map resolution at trace time.
"""
from __future__ import annotations


import jax.numpy as jnp
import numpy as np

# Anchors are listed shallow -> deep (stride 8, 16, 32), as in wrappers.py:80-84.
DEFAULT_ANCHORS = (
    (10, 13, 16, 30, 33, 23),
    (30, 61, 62, 45, 59, 119),
    (116, 90, 156, 198, 373, 326),
)
DEFAULT_STRIDES = (8, 16, 32)


def anchors_per_level(anchors=DEFAULT_ANCHORS):
    """[(A_l, 2)] float32 arrays, one per FPN level (shallow -> deep)."""
    return [np.asarray(a, dtype=np.float32).reshape(-1, 2) for a in anchors]


def grid_offsets(height: int, width: int) -> np.ndarray:
    """(H*W, 2) float32 grid of (x, y) cell indices, row-major.

    Matches the meshgrid layout of yolo3.py:68-75 after its runtime
    `reshape((1, -1, 1, 2))`.
    """
    gy, gx = np.mgrid[0:height, 0:width]
    return np.stack([gx, gy], axis=-1).reshape(-1, 2).astype(np.float32)


def level_shapes(input_hw, strides=DEFAULT_STRIDES):
    """Feature-map (H, W) per level for a given input (H, W), shallow -> deep."""
    h, w = input_hw
    return [(h // s, w // s) for s in strides]


def flat_anchor_layout(input_hw, anchors=DEFAULT_ANCHORS, strides=DEFAULT_STRIDES):
    """Static per-prediction anchor/offset/stride tables in model output order.

    The model emits predictions deep -> shallow (stride 32 level first), each
    level flattened (H*W, A) -> per-level block of length H*W*A
    (yolo3.py:481-523).  Returns numpy arrays, each (N_total, ...):
      all_anchors (N,2), all_offsets (N,2), all_strides (N,1)
    plus the per-level flat start offsets and block lengths.
    """
    anchors_l = anchors_per_level(anchors)
    shapes = level_shapes(input_hw, strides)
    anc, off, strd, lens = [], [], [], []
    # deep -> shallow
    for lvl in reversed(range(len(strides))):
        (h, w) = shapes[lvl]
        a = anchors_l[lvl]  # (A,2)
        o = grid_offsets(h, w)  # (HW,2)
        na = a.shape[0]
        anc.append(np.tile(a[None, :, :], (h * w, 1, 1)).reshape(-1, 2))
        off.append(np.repeat(o, na, axis=0))
        strd.append(np.full((h * w * na, 1), strides[lvl], dtype=np.float32))
        lens.append(h * w * na)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    return (
        np.concatenate(anc, 0),
        np.concatenate(off, 0),
        np.concatenate(strd, 0),
        starts,
        np.asarray(lens, dtype=np.int32),
    )
