"""VMZ (caffe2) R(2+1)D checkpoint import -> flax R21D param tree.

Capability parity with `/root/reference/models/definitions/rdnet/utils.py`
(`convert_weights` :7-117): the official VMZ `.pkl` checkpoints
(facebookresearch/VMZ model zoo — IG65M / Kinetics / Sports1M) are pickled
`{'blobs': {name: ndarray}}` dicts with caffe2 blob naming:

  conv1_middle_w, conv1_middle_spatbn_relu_{s,b,rm,riv}, conv1_w,
  conv1_spatbn_relu_{s,b,rm,riv}                       (the init 2+1D conv)
  comp_<i>_conv_<j>_middle_w, comp_<i>_spatbn_<j>_middle_*,
  comp_<i>_conv_<j>_w, comp_<i>_spatbn_<j>_*           (block i, conv j=1,2)
  shortcut_projection_<k>_w, shortcut_projection_<k>_spatbn_*
  last_out_L<classes>_{w,b}                             (the classifier)

Conv blobs are caffe2 NCDHW (out, in, T, H, W) -> flax (T, H, W, in, out).
"""
from __future__ import annotations

import pickle
from typing import Dict

import numpy as np

__all__ = ["load_vmz_r21d"]

_LAYERS = {34: (3, 4, 6, 3), 152: (3, 8, 36, 3)}
_BN = {"s": "scale", "b": "bias"}
_BN_STATS = {"rm": "mean", "riv": "var"}


def _conv(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _walk_set(root, path, key, value):
    node = root
    for p in path[:-1]:
        node = node[p]
    leaf = node[path[-1]]
    cur = np.asarray(leaf[key])
    value = np.asarray(value)
    assert cur.shape == value.shape, (path, key, cur.shape, value.shape)
    leaf[key] = value.astype(cur.dtype)


def _to_mutable(tree):
    if hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def load_vmz_r21d(variables: Dict, path: str, n_layers: int = 34) -> Dict:
    """Load a VMZ .pkl into R21D(return_features/taps either) variables."""
    assert n_layers in _LAYERS, "VMZ ships 34 and 152 layer R(2+1)D nets"
    with open(path, "rb") as f:
        blobs = pickle.load(f, encoding="latin1")["blobs"]

    variables = _to_mutable(dict(variables))
    params = variables["params"]
    stats = variables.setdefault("batch_stats", {})

    def set_bn(pp, sp, blob_prefix):
        for suf, key in _BN.items():
            _walk_set(params, pp, key, blobs[f"{blob_prefix}_{suf}"])
        for suf, key in _BN_STATS.items():
            _walk_set(stats, sp, key, blobs[f"{blob_prefix}_{suf}"])

    # init 2+1D conv (r21d.py init_ prefix)
    _walk_set(params, ("init", "spatial"), "kernel", _conv(blobs["conv1_middle_w"]))
    set_bn(("init", "mid_bn"), ("init", "mid_bn"), "conv1_middle_spatbn_relu")
    _walk_set(params, ("init", "temporal"), "kernel", _conv(blobs["conv1_w"]))
    set_bn(("init_bn",), ("init_bn",), "conv1_spatbn_relu")

    comp = 0
    shortcut_stage_start = {}
    for si, nblocks in enumerate(_LAYERS[n_layers], start=1):
        shortcut_stage_start[si] = comp
        for bi in range(1, nblocks + 1):
            name = f"stage{si}_block{bi}"
            for j in (1, 2):
                conv = f"conv{j}"
                _walk_set(
                    params, (name, conv, "spatial"), "kernel",
                    _conv(blobs[f"comp_{comp}_conv_{j}_middle_w"]),
                )
                set_bn(
                    (name, conv, "mid_bn"), (name, conv, "mid_bn"),
                    f"comp_{comp}_spatbn_{j}_middle",
                )
                _walk_set(
                    params, (name, conv, "temporal"), "kernel",
                    _conv(blobs[f"comp_{comp}_conv_{j}_w"]),
                )
                set_bn((name, f"bn{j}"), (name, f"bn{j}"), f"comp_{comp}_spatbn_{j}")
            # downsample projection on each stage's first block (stages 2+)
            sk = f"shortcut_projection_{shortcut_stage_start[si]}"
            if bi == 1 and f"{sk}_w" in blobs:
                _walk_set(params, (name, "down"), "kernel", _conv(blobs[f"{sk}_w"]))
                set_bn((name, "down_bn"), (name, "down_bn"), f"{sk}_spatbn")
            comp += 1

    # classifier (absent from return_features variants)
    cls_key = next((k for k in blobs if k.startswith("last_out_L") and k.endswith("_w")), None)
    if cls_key and "dense" in params:
        _walk_set(params, ("dense",), "kernel", np.transpose(blobs[cls_key], (1, 0)))
        _walk_set(params, ("dense",), "bias", blobs[cls_key[:-2] + "_b"])
    return variables
