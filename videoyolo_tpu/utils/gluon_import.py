"""Pretrained-weight import: MXNet/Gluon `.params` -> flax param trees.

The reference loads gluoncv-pretrained DarkNet-53 (`darknet/darknet.py:101
get_darknet(pretrained=...)`) and saves/loads checkpoints as `.params`
(`train_yolov3.py:289-329`).  This module reads that container format
without an MXNet dependency, so reference-trained weights can drive parity
tests and warm-start training here.

Format (mxnet 1.x `mx.nd.save`, src/ndarray/ndarray.cc):
  file   : uint64 magic 0x112, uint64 reserved,
           uint64 n, n x NDArray, uint64 m, m x (uint64 len, bytes) names
  NDArray: uint32 magic (V1 0xF993FAC8 | V2 0xF993FAC9 | V3 0xF993FACA),
           [V2/V3: int32 stype (0 = dense)],
           uint32 ndim, int64 dims[ndim]   (legacy V1 files: uint32 dims),
           int32 dev_type, int32 dev_id, int32 type_flag, raw data.

A writer for the same format is included (round-trip tested) so checkpoints
can also be *exported* for reference-side consumption.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = [
    "read_mxnet_params",
    "write_mxnet_params",
    "load_gluon_darknet53",
    "load_gluon_yolo3",
    "export_gluon_yolo3",
]

_LIST_MAGIC = 0x112
_V1 = 0xF993FAC8
_V2 = 0xF993FAC9
_V3 = 0xF993FACA

_DTYPES = {
    0: np.float32,
    1: np.float64,
    2: np.float16,
    3: np.uint8,
    4: np.int32,
    5: np.int8,
    6: np.int64,
}
_DTYPE_FLAGS = {np.dtype(v): k for k, v in _DTYPES.items()}


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.data, self.pos)
        self.pos += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def read_bytes(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out


def _read_ndarray(r: _Reader) -> np.ndarray:
    magic = r.read("I")
    if magic in (_V2, _V3):
        stype = r.read("i")
        assert stype == 0, f"sparse storage type {stype} not supported"
    elif magic != _V1:
        raise ValueError(f"bad NDArray magic 0x{magic:X}")
    ndim = r.read("I")
    fmt = "I" if magic == _V1 else "q"  # legacy V1 dims are uint32
    dims = r.read(f"{ndim}{fmt}") if ndim else ()
    shape = tuple(dims) if isinstance(dims, tuple) else (dims,)
    _dev_type, _dev_id = r.read("ii")
    type_flag = r.read("i")
    dtype = _DTYPES[type_flag]
    count = int(np.prod(shape)) if shape else 1
    raw = r.read_bytes(count * np.dtype(dtype).itemsize)
    return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()


def read_mxnet_params(path: str) -> Dict[str, np.ndarray]:
    """Parse a gluon `.params` / `mx.nd.save` file into {name: array}."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    magic = r.read("Q")
    assert magic == _LIST_MAGIC, f"not an mxnet params file (magic 0x{magic:X})"
    r.read("Q")  # reserved
    n = r.read("Q")
    arrays = [_read_ndarray(r) for _ in range(n)]
    m = r.read("Q")
    names = []
    for _ in range(m):
        ln = r.read("Q")
        names.append(r.read_bytes(ln).decode())
    assert m == n, (m, n)
    # gluon save_parameters prefixes names with 'arg:'/'aux:' historically
    names = [nm.split(":", 1)[-1] for nm in names]
    return dict(zip(names, arrays))


def write_mxnet_params(path: str, params: Dict[str, np.ndarray]):
    """Write {name: array} in the same container (V2 dense NDArrays)."""
    out = bytearray()
    out += struct.pack("<QQ", _LIST_MAGIC, 0)
    items = list(params.items())
    out += struct.pack("<Q", len(items))
    for _, arr in items:
        arr = np.ascontiguousarray(arr)
        out += struct.pack("<Ii", _V2, 0)
        out += struct.pack("<I", arr.ndim)
        out += struct.pack(f"<{arr.ndim}q", *arr.shape)
        out += struct.pack("<iii", 1, 0, _DTYPE_FLAGS[arr.dtype])
        out += arr.tobytes()
    out += struct.pack("<Q", len(items))
    for name, _ in items:
        b = name.encode()
        out += struct.pack("<Q", len(b)) + b
    with open(path, "wb") as f:
        f.write(bytes(out))


# --- darknet53 name mapping --------------------------------------------------


def _flax_darknet_conv_paths() -> List[Tuple[Tuple[str, ...], Tuple[str, ...]]]:
    """(conv_path, bn_path) pairs for Darknet53 in creation order, matching
    gluon's conv0..conv51 / batchnorm0..51 numbering."""
    layers = (1, 2, 8, 8, 4)
    paths = [
        (("conv0", "Conv_0"), ("conv0", "BatchNorm_0")),
    ]
    for si, n in enumerate(layers, start=1):
        stage = f"stage{si}"
        paths.append(
            ((stage, "ConvBNLeaky_0", "Conv_0"), (stage, "ConvBNLeaky_0", "BatchNorm_0"))
        )
        for b in range(n):
            blk = f"DarknetBasicBlock_{b}"
            for c in range(2):
                paths.append(
                    (
                        (stage, blk, f"ConvBNLeaky_{c}", "Conv_0"),
                        (stage, blk, f"ConvBNLeaky_{c}", "BatchNorm_0"),
                    )
                )
    return paths


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, key, value):
    node = _get(tree, path)
    assert key in node, (path, key, list(node))
    cur = np.asarray(node[key])
    value = np.asarray(value)
    assert cur.shape == value.shape, (path, key, cur.shape, value.shape)
    node[key] = value.astype(cur.dtype)


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


# --- full yolo3_darknet53 mapping (structured save_parameters names) --------
#
# The reference saves/loads full detectors with gluon's `save_parameters` /
# `load_parameters` (train_yolov3.py:289-329; get_yolov3 at yolo3.py:2023-2027
# loads zoo files the same way).  That format stores dot-separated STRUCTURAL
# names produced by `_collect_params_with_prefix` — child blocks are keyed by
# their position in each HybridSequential:
#
#   stages.{s}.{j}[.body.{c}].{0|1}.<leaf>   backbone conv/bn cells
#   transitions.{t}.{0|1}.<leaf>             pre-upsample 1x1 convs
#   yolo_blocks.{i}.{body.{j}|tip}.{0|1}.<leaf>
#   yolo_outputs.{i}.prediction.{weight|bias}
#   yolo_outputs.{i}.{anchor_{i}|offset_{i}} (constants; rebuilt at trace time
#                                             here — ops/anchors.py — so they
#                                             are skipped on import and
#                                             synthesised on export)
#
# where a `_conv2d` cell (layers.py:63-70) is HybridSequential(Conv2D,
# BatchNorm, LeakyReLU) => conv leaf under ".0", BN leaves under ".1".
# Index i runs deep->shallow (anchors/strides reversed in YOLOV3.__init__,
# yolo3.py:415-426), exactly matching this repo's block0/output0 = stride 32.

_DARKNET_LAYERS = (1, 2, 8, 8, 4)
# yolo3_darknet53 stage slices: features[:15], [15:24], [24:]
# (yolo3.py:2057 / yolo3_darknet53_custom)
_STAGE_SPLITS = (0, 15, 24)


def _gluon_darknet_cells(layout: str) -> List[Tuple[str, str]]:
    """(conv_prefix, bn_prefix) gluon dot-paths in creation order — the same
    order as `_flax_darknet_conv_paths`.  layout='yolo3' names the three
    stage slices 'stages.{s}.{j}'; layout='bare' names 'features.{j}' (a
    standalone darknet53 saved via save_parameters)."""
    kinds = ["conv"]
    for n in _DARKNET_LAYERS:
        kinds += ["conv"] + ["block"] * n
    cells = []
    for ci, kind in enumerate(kinds):
        if layout == "yolo3":
            s = 0 if ci < _STAGE_SPLITS[1] else (1 if ci < _STAGE_SPLITS[2] else 2)
            base = f"stages.{s}.{ci - _STAGE_SPLITS[s]}"
        else:
            base = f"features.{ci}"
        if kind == "conv":
            cells.append((f"{base}.0", f"{base}.1"))
        else:
            for c in range(2):
                cells.append((f"{base}.body.{c}.0", f"{base}.body.{c}.1"))
    return cells


def _gluon_yolo3_entries() -> List[Tuple[str, str, Tuple[str, ...], Tuple[str, ...]]]:
    """(gluon_conv_prefix, gluon_bn_prefix, flax_conv_path, flax_bn_path) for
    every conv-BN cell of the full yolo3_darknet53 graph."""
    entries = []
    for cell, (conv_path, bn_path) in zip(
        _gluon_darknet_cells("yolo3"), _flax_darknet_conv_paths()
    ):
        entries.append(
            (cell[0], cell[1], ("backbone",) + conv_path, ("backbone",) + bn_path)
        )
    for i in range(3):
        for j in range(5):
            base = (f"block{i}", f"ConvBNLeaky_{j}")
            entries.append(
                (
                    f"yolo_blocks.{i}.body.{j}.0",
                    f"yolo_blocks.{i}.body.{j}.1",
                    base + ("Conv_0",),
                    base + ("BatchNorm_0",),
                )
            )
        entries.append(
            (
                f"yolo_blocks.{i}.tip.0",
                f"yolo_blocks.{i}.tip.1",
                (f"block{i}", "ConvBNLeaky_5", "Conv_0"),
                (f"block{i}", "ConvBNLeaky_5", "BatchNorm_0"),
            )
        )
    for t in range(2):
        entries.append(
            (
                f"transitions.{t}.0",
                f"transitions.{t}.1",
                (f"transition{t}", "Conv_0"),
                (f"transition{t}", "BatchNorm_0"),
            )
        )
    return entries


def load_gluon_yolo3(variables: Dict, path: str) -> Dict:
    """Load a full reference/gluoncv yolo3_darknet53 `.params` checkpoint
    (structured save_parameters names) into YOLOv3 variables.

    Covers every learnable tensor: 52 backbone cells, 18 head block cells,
    2 transitions, and the 3 per-level prediction convs (weight OIHW->HWIO,
    bias).  `anchor_{i}`/`offset_{i}` constants are skipped — this build
    reconstructs the grids at trace time (ops/anchors.py) instead of storing
    oversized alloc_size maps (yolo3.py:56-75)."""
    raw = read_mxnet_params(path)
    variables = _to_mutable(dict(variables))
    params = variables["params"] = _to_mutable(variables["params"])
    stats = variables["batch_stats"] = _to_mutable(variables.get("batch_stats", {}))

    for conv_pref, bn_pref, conv_path, bn_path in _gluon_yolo3_entries():
        w = raw[conv_pref + ".weight"]
        _set(params, conv_path, "kernel", np.transpose(w, (2, 3, 1, 0)))
        _set(params, bn_path, "scale", raw[f"{bn_pref}.gamma"])
        _set(params, bn_path, "bias", raw[f"{bn_pref}.beta"])
        _set(stats, bn_path, "mean", raw[f"{bn_pref}.running_mean"])
        _set(stats, bn_path, "var", raw[f"{bn_pref}.running_var"])
    for i in range(3):
        w = raw[f"yolo_outputs.{i}.prediction.weight"]
        _set(params, (f"output{i}", "prediction"), "kernel", np.transpose(w, (2, 3, 1, 0)))
        _set(params, (f"output{i}", "prediction"), "bias", raw[f"yolo_outputs.{i}.prediction.bias"])
    return variables


def export_gluon_yolo3(
    variables: Dict,
    path: str,
    anchors: Sequence[Sequence[float]] = (
        (10, 13, 16, 30, 33, 23),
        (30, 61, 62, 45, 59, 119),
        (116, 90, 156, 198, 373, 326),
    ),
    alloc_size: Tuple[int, int] = (128, 128),
):
    """Write YOLOv3 variables as a reference-loadable `.params` file.

    Emits the exact structural name set gluon's `load_parameters` expects for
    yolo3_darknet53 — including the `anchor_{i}`/`offset_{i}` constants it
    stores as parameters (synthesised here; shapes per yolo3.py:56-75, with
    per-level anchors reversed deep-first like YOLOV3.__init__)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for conv_pref, bn_pref, conv_path, bn_path in _gluon_yolo3_entries():
        w = np.asarray(_get(params, conv_path)["kernel"], np.float32)
        out[conv_pref + ".weight"] = np.transpose(w, (3, 2, 0, 1))
        bn = _get(params, bn_path)
        bs = _get(stats, bn_path)
        out[f"{bn_pref}.gamma"] = np.asarray(bn["scale"], np.float32)
        out[f"{bn_pref}.beta"] = np.asarray(bn["bias"], np.float32)
        out[f"{bn_pref}.running_mean"] = np.asarray(bs["mean"], np.float32)
        out[f"{bn_pref}.running_var"] = np.asarray(bs["var"], np.float32)
    grid_x, grid_y = np.meshgrid(np.arange(alloc_size[1]), np.arange(alloc_size[0]))
    offsets = np.concatenate(
        (grid_x[:, :, None], grid_y[:, :, None]), axis=-1
    )[None, None].astype(np.float32)
    anchors_rev = list(anchors)[::-1]
    for i in range(3):
        node = _get(params, (f"output{i}", "prediction"))
        out[f"yolo_outputs.{i}.prediction.weight"] = np.transpose(
            np.asarray(node["kernel"], np.float32), (3, 2, 0, 1)
        )
        out[f"yolo_outputs.{i}.prediction.bias"] = np.asarray(node["bias"], np.float32)
        out[f"yolo_outputs.{i}.anchor_{i}"] = np.asarray(
            anchors_rev[i], np.float32
        ).reshape(1, 1, -1, 2)
        out[f"yolo_outputs.{i}.offset_{i}"] = offsets
    write_mxnet_params(path, out)


def load_gluon_darknet53(variables: Dict, path: str, prefix: str = "backbone") -> Dict:
    """Load gluoncv darknet53 pretrained weights into Darknet53 variables.

    Gluon names look like `darknetv3<N>_conv<K>_weight` and
    `darknetv3<N>_batchnorm<K>_{gamma,beta,running_mean,running_var}`; K runs
    in creation order, which this maps structurally onto the flax tree
    (OIHW -> HWIO).  `prefix` is the backbone's scope inside `variables`
    ('' when loading into a bare Darknet53)."""
    import re

    raw = read_mxnet_params(path)
    convs: Dict[int, np.ndarray] = {}
    bns: Dict[int, Dict[str, np.ndarray]] = {}
    for name, arr in raw.items():
        m = re.search(r"conv(\d+)_weight$", name)
        if m and "batchnorm" not in name:
            convs[int(m.group(1))] = arr
            continue
        m = re.search(r"batchnorm(\d+)_(gamma|beta|running_mean|running_var)$", name)
        if m:
            bns.setdefault(int(m.group(1)), {})[m.group(2)] = arr

    paths = _flax_darknet_conv_paths()
    assert len(convs) >= len(paths), (
        f"{len(convs)} convs in file < {len(paths)} needed (not a darknet53?)"
    )

    variables = _to_mutable(dict(variables))
    params = variables["params"] = _to_mutable(variables["params"])
    stats = variables["batch_stats"] = _to_mutable(variables.get("batch_stats", {}))
    proot = params[prefix] if prefix else params
    sroot = stats[prefix] if prefix else stats

    conv_keys = sorted(convs)
    bn_keys = sorted(bns)
    for i, (conv_path, bn_path) in enumerate(paths):
        w = convs[conv_keys[i]]
        _set(proot, conv_path, "kernel", np.transpose(w, (2, 3, 1, 0)))
        bn = bns[bn_keys[i]]
        _set(proot, bn_path, "scale", bn["gamma"])
        _set(proot, bn_path, "bias", bn["beta"])
        _set(sroot, bn_path, "mean", bn["running_mean"])
        _set(sroot, bn_path, "var", bn["running_var"])
    return variables
