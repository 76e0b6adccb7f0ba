"""Class-predictor weight surgery (finetune across class sets).

Capability parity with the reference's `reset_class`
(`/root/reference/models/definitions/yolo/yolo3.py:558-630` name/index
mapping resolution; `:76-129` per-anchor channel copy): rebuilds every
output head's 1x1 prediction conv for a new class count and copies the
box/objectness rows plus any `reuse_weights`-mapped class rows from the old
kernel, per anchor.

Functional design: parameters are an immutable pytree, so surgery is a pure
function `variables -> variables` — no mutable-module machinery.
"""
from __future__ import annotations

import warnings
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resolve_reuse_map", "reset_class"]

ReuseSpec = Union[Dict, List, None]


def resolve_reuse_map(
    reuse_weights: ReuseSpec,
    old_classes: Sequence[str],
    new_classes: Sequence[str],
) -> Optional[Dict[int, int]]:
    """Normalise {new: old} with str or int keys/values, or a plain name list
    (yolo3.py:589-626)."""
    if reuse_weights is None:
        return None
    old_classes = list(old_classes)
    new_classes = list(new_classes)
    if isinstance(reuse_weights, dict):
        out = {}
        for k, v in reuse_weights.items():
            if isinstance(v, str):
                if v not in old_classes:
                    raise ValueError(f"{v} not found in old class names")
                v = old_classes.index(v)
            elif not 0 <= v < len(old_classes):
                raise ValueError(f"index {v} out of bounds for old classes")
            if isinstance(k, str):
                if k not in new_classes:
                    raise ValueError(f"{k} not found in new class names")
                k = new_classes.index(k)
            elif not 0 <= k < len(new_classes):
                raise ValueError(f"index {k} out of bounds for new classes")
            out[k] = v
        return out
    # list of unchanged names
    out = {}
    for name in reuse_weights:
        if name in old_classes and name in new_classes:
            out[new_classes.index(name)] = old_classes.index(name)
        else:
            warnings.warn(f"{name} not found in old or new class names")
    return out


def _rebuild_pred(kernel, bias, old_c, new_c, reuse, rng):
    """Per-anchor channel copy (yolo3.py:111-129).  kernel: (..., in, A*(5+old_c))."""
    old_pred = 5 + old_c
    new_pred = 5 + new_c
    num_anchors = kernel.shape[-1] // old_pred
    k_shape = kernel.shape[:-1] + (num_anchors * new_pred,)
    kr, br = jax.random.split(rng)
    fan_in = int(np.prod(kernel.shape[:-1]))
    new_kernel = jax.random.normal(kr, k_shape, kernel.dtype) / np.sqrt(fan_in)
    new_bias = jnp.zeros((num_anchors * new_pred,), bias.dtype)
    for a in range(num_anchors):
        on, oo = a * new_pred, a * old_pred
        # box + objectness rows always carry over
        new_kernel = new_kernel.at[..., on : on + 5].set(kernel[..., oo : oo + 5])
        new_bias = new_bias.at[on : on + 5].set(bias[oo : oo + 5])
        if reuse:
            for nk, ov in reuse.items():
                if nk >= new_c or ov >= old_c:
                    warnings.warn(
                        f"reuse mapping {nk}/{new_c} -> {ov}/{old_c} out of range"
                    )
                    continue
                new_kernel = new_kernel.at[..., on + 5 + nk].set(
                    kernel[..., oo + 5 + ov]
                )
                new_bias = new_bias.at[on + 5 + nk].set(bias[oo + 5 + ov])
    return new_kernel, new_bias


def reset_class(
    variables: Dict,
    old_classes: Sequence[str],
    new_classes: Sequence[str],
    reuse_weights: ReuseSpec = None,
    rng: Optional[jax.Array] = None,
):
    """Return a new `variables` pytree whose output-head prediction convs
    target `new_classes`; rows named by `reuse_weights` keep their trained
    values.  Works for any model in the family whose heads follow the
    `output*/prediction` naming (YOLOv3, YOLOv3T conv heads, YOLOv3Temporal)."""
    old_c, new_c = len(old_classes), len(new_classes)
    reuse = resolve_reuse_map(reuse_weights, old_classes, new_classes)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    variables = jax.tree_util.tree_map(lambda x: x, dict(variables))  # copy
    params = variables["params"] = dict(variables["params"])

    def walk(tree, rng):
        tree = dict(tree)
        for name, sub in tree.items():
            if name.startswith("output") and isinstance(sub, dict) and "prediction" in sub:
                pred = dict(sub["prediction"])
                if "kernel" not in pred:
                    warnings.warn(
                        f"{name}: non-conv prediction head (RNN) re-initialised "
                        "without reuse (matches reference caveat yolo3.py:102)"
                    )
                    continue
                rng, sub_rng = jax.random.split(rng)
                k, b = _rebuild_pred(
                    pred["kernel"], pred["bias"], old_c, new_c, reuse, sub_rng
                )
                pred["kernel"], pred["bias"] = k, b
                tree[name] = dict(sub, prediction=pred)
            elif isinstance(sub, dict):
                rng, sub_rng = jax.random.split(rng)
                tree[name] = walk(sub, sub_rng)
        return tree

    variables["params"] = walk(params, rng)
    return variables
