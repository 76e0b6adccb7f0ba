"""On-device photometric augmentation: per-image affine color maps.

TPU-first split of the reference's host-side `random_color_distort` +
normalize (`/root/reference/models/transforms/video.py:68-158`,
`yolo/transforms.py:60-107`): the host samples ONE (3,4) affine matrix per
image (data/transforms.sample_color_matrix — brightness/contrast/saturation/
hue and normalization are all affine on RGB, so they compose exactly), ships
uint8 pixels, and this op applies the matrix inside the jitted train step.
XLA fuses the 3x3 matmul + bias into the input elementwise pipeline, so the
device cost is ~zero; the host saves ~8 ms/image of float color math and
host->device traffic drops 4x (uint8 vs float32).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply_color"]


def apply_color(x: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Apply per-image (3,4) color matrices to [0,255] pixels.

    x:   (B, H, W, 3) or (B, K, H, W, 3), any real dtype (uint8 typical)
    mat: (B, 3, 4) — out_c = sum_d A[c,d] * in_d + b[c]
    Returns float32 (already normalized: the matrix folds (x/255-mean)/std).
    """
    import jax.lax

    x = x.astype(jnp.float32)
    a = mat[:, :, :3].astype(jnp.float32)
    b = mat[:, :, 3].astype(jnp.float32)
    # full f32 precision: the matrix folds normalization, and the MXU's
    # default bf16 would quantize pixel values by ~0.25%
    p = jax.lax.Precision.HIGHEST
    if x.ndim == 4:
        return jnp.einsum("bhwc,bdc->bhwd", x, a, precision=p) + b[:, None, None, :]
    if x.ndim == 5:
        return jnp.einsum("bkhwc,bdc->bkhwd", x, a, precision=p) + b[:, None, None, None, :]
    raise ValueError(f"expected 4D/5D image batch, got {x.shape}")
