"""Native host runtime: C++ data-loader core with ctypes bindings.

The TPU compute path is jax/XLA/pallas; the host IO path around it is native
C++ (`loader.cc`): multithreaded JPEG decode + bilinear resize + normalize
producing ready-to-ship NHWC float32 batches.  This owns the role MXNet's
native image/DataLoader machinery plays for the reference
(`/root/reference/train_yolov3.py:240-286`).

The shared library auto-builds on first use (a few seconds, cached); all
callers fall back to the Python/cv2 path when the toolchain or libjpeg is
unavailable, so the framework never hard-depends on the native core.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libvyloader.so")
_SRC = os.path.join(_DIR, "loader.cc")
_lock = threading.Lock()
_lib = None
_tried = False

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _build() -> bool:
    base = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _SO, "-ljpeg", "-lpthread",
    ]
    # -march=native lets gcc vectorise the resampling inner loops; retry
    # plain if the flag is unsupported on this toolchain
    for cmd in (base[:1] + ["-march=native"] + base[1:], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception as e:  # toolchain/libjpeg missing — degrade gracefully
            logging.debug("native loader build failed (%s): %s", cmd[1], e)
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native loader; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.vy_load_batch.restype = ctypes.c_int
            lib.vy_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            lib.vy_load_train_batch.restype = ctypes.c_int
            lib.vy_load_train_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            _lib = lib
        except OSError as e:
            logging.debug("native loader dlopen failed: %s", e)
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_batch(
    paths: Sequence[str],
    out_h: int,
    out_w: int,
    mean: np.ndarray = MEAN,
    std: np.ndarray = STD,
    threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize+normalize a JPEG batch natively.

    Returns (batch (N, out_h, out_w, 3) float32, sizes (N, 2) original (h, w);
    -1 rows mark decode failures, zero-filled in the batch).
    Raises RuntimeError if the native core is unavailable.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable (g++/libjpeg missing?)")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    sizes = np.empty((n, 2), np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    nthreads = threads or (os.cpu_count() or 1)
    lib.vy_load_batch(
        arr, n, out_h, out_w,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        nthreads,
    )
    return out, sizes


def load_train_batch(
    paths: Sequence[str],
    rects: np.ndarray,  # (N, 4) x0,y0,w,h crop windows in image coords
    flips: np.ndarray,  # (N,) bool/uint8
    interps: np.ndarray,  # (N,) 0-4 (4 maps to cubic natively)
    out_h: int,
    out_w: int,
    fill: Sequence[float],  # rgb in [0,255]
    threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Augmented train decode: JPEG -> fused pad-crop-resize-flip, uint8 NHWC.

    Consumes the geometry plans sampled by the train transform
    (data/transforms.YOLO3DefaultTrainTransform.plan); color/normalization
    is NOT applied (ops/color.py does it on device).  Returns
    (batch (N, out_h, out_w, 3) uint8, ok (N,) int32 — 0 marks decode
    failures, left as fill tiles).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable (g++/libjpeg missing?)")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    ok = np.empty((n,), np.int32)
    rects = np.ascontiguousarray(rects, np.int32)
    flips = np.ascontiguousarray(flips, np.uint8)
    interps = np.ascontiguousarray(interps, np.uint8)
    fill_u8 = np.ascontiguousarray(np.round(fill), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.vy_load_train_batch(
        arr, n,
        rects.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        interps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w,
        fill_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        threads or (os.cpu_count() or 1),
    )
    return out, ok
