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
