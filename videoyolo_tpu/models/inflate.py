"""2D -> 3D / 2+1D pretrained-weight inflation for Darknet3D.

Capability parity with `/root/reference/models/definitions/darknet/
three_darknet.py:274-318`: imagenet-pretrained 2D DarkNet-53 weights
initialise the 3D variants —
  * conv_type 3 : the 2D kernel is repeated tau times along the new time
    axis and divided by tau (activation-preserving on static frames);
  * conv_type 21: the spatial (1,k,k) half gets the 2D kernel verbatim and
    the depthwise temporal half a uniform 1/tau kernel, so a repeated-frame
    clip flows exactly like the 2D net (the repeat-pad in Conv21DRepPad
    keeps that true at clip edges);
  * BN statistics/affine carry over to the (spatial) cell's BN.

`inflate_darknet53_to_3d` walks the 52 conv cells of both models in
creation order, so any `conv_types` mix is supported.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .darknet3d import DARKNET_LAYERS
from ..utils.gluon_import import _flax_darknet_conv_paths

__all__ = ["inflate_darknet53_to_3d"]


def _cells_3d(conv_types: Sequence[int]) -> List[Tuple[Tuple[str, ...], int, int]]:
    """(module_path, conv_type, kernel) per cell, creation order matching
    Darknet53's 52 cells."""
    cells = [(("stem",), conv_types[0], 3)]
    for i, n in enumerate(DARKNET_LAYERS):
        ct = conv_types[i + 1]
        cells.append(((f"down{i}",), ct, 3))
        for j in range(n):
            blk = f"stage{i}_block{j}"
            cells.append(((blk, "_Unit_0"), 3 if ct == 21 else ct, 1))
            cells.append(((blk, "_Unit_1"), ct, 3))
    return cells


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _to_mutable(tree):
    if hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _unit_inner(node: Dict) -> Tuple[str, Dict]:
    """A _Unit wraps exactly one cell module; find it."""
    for key in node:
        if key.startswith(("ConvBNLeaky", "Conv21DRepPad")):
            return key, node[key]
    raise KeyError(f"no conv cell under {list(node)}")


def inflate_darknet53_to_3d(
    vars2d: Dict,
    vars3d: Dict,
    conv_types: Sequence[int],
    tau: int = 3,
    prefix2d: str = "",
) -> Dict:
    """Fill a Darknet3D(conv_types) variables tree from Darknet53 variables.

    `tau` is the temporal kernel extent used by the 3D cells (3 throughout
    this family).  Returns a new 3D variables tree.
    """
    paths2d = _flax_darknet_conv_paths()
    cells3d = _cells_3d(tuple(conv_types))
    assert len(paths2d) == len(cells3d) == 52

    p2 = vars2d["params"][prefix2d] if prefix2d else vars2d["params"]
    s2 = (
        vars2d.get("batch_stats", {}).get(prefix2d, {})
        if prefix2d
        else vars2d.get("batch_stats", {})
    )
    out = _to_mutable(dict(vars3d))
    p3, s3 = out["params"], out.setdefault("batch_stats", {})

    for (conv_path, bn_path), (mod_path, ct, kern) in zip(paths2d, cells3d):
        w2 = np.asarray(_get(p2, conv_path)["kernel"])  # (kh, kw, ci, co)
        bn2p = _get(p2, bn_path)
        bn2s = _get(s2, bn_path)

        node_p = _get(p3, mod_path)
        node_s = _get(s3, mod_path)
        key, cell_p = _unit_inner(node_p)
        cell_s = node_s[key]

        if key.startswith("Conv21DRepPad"):
            # named submodules: 'spatial' ConvBNLeaky3D + depthwise 'temporal'
            # conv with no post-BN (darknet3d.Conv21DRepPad)
            sp, ss = cell_p["spatial"], cell_s["spatial"]
            sp["Conv_0"]["kernel"] = w2[None].astype(
                np.asarray(sp["Conv_0"]["kernel"]).dtype
            )
            _copy_bn(sp["BatchNorm_0"], ss["BatchNorm_0"], bn2p, bn2s)
            tk = np.asarray(cell_p["temporal"]["kernel"])
            cell_p["temporal"]["kernel"] = np.full_like(tk, 1.0 / tk.shape[0])
        else:
            conv = cell_p["Conv_0"]
            k3 = np.asarray(conv["kernel"])
            if k3.ndim == 5:  # 3D cell: repeat / tau over the time extent
                kt = k3.shape[0]
                conv["kernel"] = (
                    np.repeat(w2[None], kt, axis=0) / float(kt)
                ).astype(k3.dtype)
            else:  # plain 2D cell
                conv["kernel"] = w2.astype(k3.dtype)
            _copy_bn(cell_p["BatchNorm_0"], cell_s["BatchNorm_0"], bn2p, bn2s)
    return out


def _copy_bn(dst_p, dst_s, src_p, src_s):
    dst_p["scale"] = np.asarray(src_p["scale"], np.asarray(dst_p["scale"]).dtype)
    dst_p["bias"] = np.asarray(src_p["bias"], np.asarray(dst_p["bias"]).dtype)
    dst_s["mean"] = np.asarray(src_s["mean"], np.asarray(dst_s["mean"]).dtype)
    dst_s["var"] = np.asarray(src_s["var"], np.asarray(dst_s["var"]).dtype)
