"""Post-training int8 quantization for serving.

Converts a trained f32 checkpoint into the parameter tree consumed by the
`quant=True` model variants (models/layers.ConvBNLeaky._quant_call): for
every conv-BN-leaky cell the BatchNorm is folded into the conv
(w' = w * gamma/sqrt(var+eps), b' = beta - mean * gamma/sqrt(var+eps)),
weights are quantised symmetrically per OUTPUT channel
(wscale_c = max|w'[..., c]| / 127), and activations are left to the cell's
dynamic per-image quantisation at runtime.  Prediction convs (tiny 1x1
heads feeding the decode, yolo3.py:25-199 equivalent) stay f32.

The reference has no quantised path — this is a TPU serving feature: int8
conv contracts on the MXU at ~1.7x bf16 throughput (measured on v5e,
tools/prof_int8.py).  Typical PTQ accuracy cost for per-channel weights +
dynamic activations on detection heads is well under 1 mAP; validate on
your dataset with `detect_yolo3.py --quantize int8` before serving.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..models.layers import BN_EPS

__all__ = [
    "fold_bn_cell",
    "quantize_cell",
    "quantize_detector_variables",
    "calibrate_detector_variables",
    "quantize_static",
    "quantize_fused",
    "assert_quantizable",
    "replace_quant",
]


def fold_bn_cell(kernel, gamma, beta, mean, var):
    """Fold BN (eps per models/layers.BN_EPS) into a conv kernel.
    kernel: (Kh, Kw, Cin, Cout) HWIO.  Returns (kernel', bias').

    Handles the space-to-depth stem cell (darknet.ConvBNLeakyS2D), whose BN
    pools statistics across the 4 spatial phases: its (C,) BN params fold
    into the 4C-channel conv by tiling (output channel j = phase*C + c uses
    BN channel c = j % C)."""
    kernel = np.asarray(kernel, np.float32)
    scale = np.asarray(gamma, np.float32) / np.sqrt(
        np.asarray(var, np.float32) + BN_EPS
    )
    b = np.asarray(beta, np.float32) - np.asarray(mean, np.float32) * scale
    cout = kernel.shape[-1]
    if scale.shape[0] != cout:
        rep = cout // scale.shape[0]
        assert scale.shape[0] * rep == cout, (scale.shape, kernel.shape)
        scale = np.tile(scale, rep)
        b = np.tile(b, rep)
    w = kernel * scale  # broadcasts over the trailing Cout axis
    return w, b


def quantize_cell(kernel, gamma, beta, mean, var) -> Dict[str, np.ndarray]:
    """One conv-BN cell -> {qkernel int8, wscale f32[Cout], bias f32[Cout]}.
    Kernel may be 2D (Kh, Kw, Cin, Cout) or 3D (Kt, Kh, Kw, Cin, Cout)."""
    w, b = fold_bn_cell(kernel, gamma, beta, mean, var)
    reduce_axes = tuple(range(w.ndim - 1))
    wscale = np.maximum(np.max(np.abs(w), axis=reduce_axes) / 127.0, 1e-12)
    qkernel = np.clip(np.round(w / wscale), -127, 127).astype(np.int8)
    return {
        "qkernel": qkernel,
        "wscale": wscale.astype(np.float32),
        "bias": b.astype(np.float32),
    }


def _items(tree):
    return tree.items() if hasattr(tree, "items") else ()


def quantize_detector_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """f32 {params, batch_stats} -> {params} for the `quant=True` model.

    Walks the tree; every node shaped like a ConvBNLeaky scope (children
    `Conv_0` + `BatchNorm_0`) is replaced by its quantised cell; all other
    leaves (prediction convs, Dense heads) pass through unchanged."""
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        if hasattr(p, "items"):
            if "Conv_0" in p and "BatchNorm_0" in p:
                bn_p = p["BatchNorm_0"]
                if not (hasattr(s, "items") and "BatchNorm_0" in s):
                    raise ValueError(
                        "quantize_detector_variables needs the batch_stats "
                        "collection to fold BatchNorm (params-only trees "
                        "cannot be quantized)"
                    )
                bn_s = s["BatchNorm_0"]
                return quantize_cell(
                    p["Conv_0"]["kernel"],
                    bn_p["scale"],
                    bn_p["bias"],
                    bn_s["mean"],
                    bn_s["var"],
                )
            return {
                k: walk(v, s[k] if hasattr(s, "items") and k in s else {})
                for k, v in p.items()
            }
        return p

    return {"params": walk(variables["params"], stats)}


def replace_quant(model, mode):
    """`dataclasses.replace(model, quant=mode)` that also threads the mode
    into a quant-capable `backbone` submodule (TwoStreamDarknet's mixed
    int8) so the two stay in lockstep (YOLOv3T._validate asserts it)."""
    import dataclasses

    kw: Dict[str, Any] = {"quant": mode}
    bb = getattr(model, "backbone", None)
    if bb is not None and hasattr(bb, "quant"):
        kw["backbone"] = dataclasses.replace(bb, quant=mode)
    return dataclasses.replace(model, **kw)


def assert_quantizable(model):
    """One predicate for 'can this model take the int8 path' — shared by the
    detect CLI and any future caller so eligibility can't drift from the
    model-side asserts (YOLOv3T._validate)."""
    from ..models.ts_darknet import TwoStreamDarknet
    from ..models.yolo3 import YOLOv3
    from ..models.yolo3_temporal import YOLOv3T, YOLOv3Temporal

    if type(model) in (YOLOv3, YOLOv3Temporal):
        return
    if type(model) is YOLOv3T:
        # RNN configs serve mixed precision: ConvBNLeaky cells int8, the
        # ConvRNN tips/outputs real-valued (no BN to fold; requantising the
        # recurrent carry would compound rounding across the k-step scan)
        assert model.backbone is None or isinstance(
            model.backbone, TwoStreamDarknet
        ), (
            "int8 temporal backbones: built-in (2D/3D/2+1D blocks) or the "
            "two-stream family (darknet side int8, motion stream bf16)"
        )
        return
    raise AssertionError(
        "int8 serving supports yolo3_darknet53 and its temporal variants"
    )


def quantize_static(model, variables, batches):
    """The full static-int8 conversion recipe in one call:
    f32 (model, variables) + calibration image batches ->
    (quant='static' model, converted variables).  Used by the detect CLI
    (--quantize int8), bench.py, and serving exports."""
    qvars = quantize_detector_variables(variables)
    qvars = calibrate_detector_variables(replace_quant(model, True), qvars, batches)
    return replace_quant(model, "static"), qvars


def quantize_fused(model, variables, batches):
    """The fused int8-end-to-end conversion: f32 (model, variables) +
    calibration batches -> (quant='fused' model, converted variables).

    The fused pipeline keeps activations int8 across cell boundaries: each
    cell requantises its own output with a calibrated `oscale` (consumed by
    the next conv's dequant factor), residual joins are QuantResidual cells
    (int8 in/out, own calibrated scale), and FPN concats rescale onto a
    common scale without leaving int8 (models/layers.quant_concat).  This
    removes the bf16 side-outputs the static path's residual adds force the
    conv fusions to materialise — the memory-bound floor ROADMAP measured.

    Calibration runs the same wiring with dynamic scales ("fused_calib"),
    sowing input amax / output amax / join amax under "quant_calib"."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..models.yolo3 import YOLOv3

    assert type(model) is YOLOv3, (
        "the fused int8 pipeline currently covers YOLOv3 (temporal families "
        "serve via quant='static'/'dynamic' — ops/quantize.quantize_static)"
    )
    qvars = quantize_detector_variables(variables)
    calib_model = dataclasses.replace(model, quant="fused_calib")
    calib_apply = jax.jit(
        lambda v, xx: calib_model.apply(v, xx, train=False, mutable=["quant_calib"])
    )
    amax_tree = None
    for x in batches:
        _, aux = calib_apply(qvars, x)
        cur = aux["quant_calib"]
        amax_tree = (
            cur
            if amax_tree is None
            else jax.tree_util.tree_map(jnp.maximum, amax_tree, cur)
        )
    assert amax_tree is not None, "need at least one calibration batch"
    amax_tree = jax.device_get(amax_tree)
    params = _insert_fused_scales(qvars["params"], amax_tree)
    return dataclasses.replace(model, quant="fused"), {"params": params}


def _insert_fused_scales(params, calib):
    """Insert the fused-mode scale params from the sown calibration tree:
    cells (nodes with `qkernel`) gain `xscale` (real-valued input only) and
    `oscale`; calib-only scopes with an `amax` (the QuantResidual joins,
    which have no params during calibration) are created with `xscale`."""

    def _scale(v):
        if isinstance(v, (tuple, list)):
            v = v[0]
        return np.float32(max(np.float32(v) / 127.0, 1e-12))

    def walk(p, c):
        if not hasattr(p, "items"):
            return p
        cmap = c if hasattr(c, "items") else {}
        if "qkernel" in p:
            out = dict(p)
            if "amax" in cmap:
                out["xscale"] = _scale(cmap["amax"])
            if "oamax" in cmap:
                out["oscale"] = _scale(cmap["oamax"])
            return out
        out = {k: walk(v, cmap.get(k, {})) for k, v in p.items()}
        for k, v in cmap.items():
            if k not in out and hasattr(v, "items") and "amax" in v:
                out[k] = {"xscale": _scale(v["amax"])}
        return out

    return walk(params, calib)


def calibrate_detector_variables(qmodel_dynamic, qvars, batches):
    """Dynamic-quant variables -> static-quant variables via calibration.

    Runs the `quant=True` (dynamic) model over `batches` (an iterable of
    image arrays), collects every cell's observed activation amax (sown
    under the "quant_calib" collection), and inserts per-cell `xscale`
    params for the `quant="static"` model — which skips the per-layer max
    pass at serving time (measured 2007 -> 2795 fps detect at B=128/416
    on v5e)."""
    import jax
    import jax.numpy as jnp

    calib_apply = jax.jit(
        lambda v, xx: qmodel_dynamic.apply(v, xx, train=False, mutable=["quant_calib"])
    )
    amax_tree = None
    for x in batches:
        _, aux = calib_apply(qvars, x)
        cur = aux["quant_calib"]
        amax_tree = (
            cur
            if amax_tree is None
            else jax.tree_util.tree_map(jnp.maximum, amax_tree, cur)
        )
    assert amax_tree is not None, "need at least one calibration batch"
    amax_tree = jax.device_get(amax_tree)

    def insert(p, c):
        if hasattr(p, "items"):
            if "qkernel" in p:
                amax = c["amax"]
                if isinstance(amax, (tuple, list)):
                    amax = amax[0]
                xscale = np.maximum(np.float32(amax) / 127.0, 1e-12)
                return {**p, "xscale": np.float32(xscale)}
            return {
                k: insert(v, c[k]) if hasattr(c, "items") and k in c else v
                for k, v in p.items()
            }
        return p

    return {"params": insert(qvars["params"], amax_tree)}
