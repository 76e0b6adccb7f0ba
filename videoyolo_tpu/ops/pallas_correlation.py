"""Pallas TPU kernel for the correlation cost volume.

The XLA fallback (`ops/correlation.py`) materialises one shifted elementwise
product per displacement: for FlowNetC's d=20/stride-2 window that is 441
passes over the two feature maps — ~441x the minimum HBM traffic if XLA
fails to tile the loop.  This kernel blocks the computation so each input
tile is read into VMEM ONCE and all displacements are computed from VMEM:

  grid (B, H/Th):  f1 row-tile (Th, W, C) and the full padded f2 plane are
  VMEM-resident; a fori_loop over the (2s+1)^2 displacements slices the
  shifted f2 window (pl.ds — static sizes, dynamic starts) and reduces over
  C on the VPU.  Output is written displacement-major (B, D, H, W) so the
  per-iteration store indexes a *leading* axis (sublane/lane layout of each
  (Th, W) plane stays dense), then transposed once to NHWC outside.

Used by `ops.correlation.correlation(..., use_pallas=True)` — the public op
keeps identical semantics/normalisation to MXNet `F.Correlation`
(reference flownet.py:204-205, layers.py:120-122).

Measured on v5e under forced timing (distinct inputs + device_get): XLA's
own tiling of the windowed-product fallback reaches the same throughput
(d=20/stride-2 at B=16x26x26x256: 4.91 ms Pallas vs 4.98 ms XLA — round
1's "~10x" figure was an async-dispatch measurement artifact).  The kernel
is kept because its VMEM-residency bound on HBM traffic is explicit rather
than at the scheduler's discretion, and it is bit-identical to the
fallback (max |diff| 0.0 in the matched-config probe, tools/prof_temporal.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["correlation_pallas"]


def _corr_kernel(f1_ref, f2_ref, out_ref, *, steps, stride2, pad, th, w, norm):
    """fori_loop over dy (dynamic offsets on the untiled row axis are fine),
    static unroll over dx (Mosaic handles unaligned *static* sublane slices
    of loaded vectors via register shuffles)."""
    f1 = f1_ref[0].astype(jnp.float32)  # (Th, W, C)
    r0 = pl.program_id(1) * th  # row offset of this tile in the full plane

    def body(iy, _):
        dy = iy * stride2 - (steps // 2) * stride2
        f2row = f2_ref[0, pl.ds(r0 + pad + dy, th), :, :].astype(jnp.float32)
        for jx in range(steps):  # static: (2s+1) slices of the loaded value
            dx = jx * stride2 - (steps // 2) * stride2
            f2blk = jax.lax.slice_in_dim(f2row, pad + dx, pad + dx + w, axis=1)
            plane = jnp.sum(f1 * f2blk, axis=-1) * norm  # (Th, W)
            out_ref[0, iy * steps + jx, :, :] = plane
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


@functools.partial(
    jax.jit, static_argnames=("max_displacement", "stride2", "row_tile", "interpret")
)
def correlation_pallas(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int,
    stride2: int = 1,
    row_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cost volume (kernel_size=1, stride1=1): (B,H,W,C) x2 -> (B,H,W,D),
    D = (2*(d//stride2)+1)^2, normalised by C (Caffe/MXNet semantics)."""
    b, h, w, c = f1.shape
    d = max_displacement
    s = d // stride2
    steps = 2 * s + 1
    n_disp = steps * steps
    pad = d

    # pad rows so the row grid divides evenly; pad f2 spatially by d
    th = min(row_tile, h)
    hp = ((h + th - 1) // th) * th
    f1p = jnp.pad(f1, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    f2p = jnp.pad(f2, ((0, 0), (pad, pad + hp - h), (pad, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _corr_kernel,
            steps=steps,
            stride2=stride2,
            pad=pad,
            th=th,
            w=w,
            norm=1.0 / float(c),
        ),
        grid=(b, hp // th),
        in_specs=[
            pl.BlockSpec(
                (1, th, w, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM
            ),
            # the whole padded plane of one batch element stays VMEM-resident
            # across its row tiles; halo rows come from in-kernel pl.ds
            pl.BlockSpec(
                (1, f2p.shape[1], f2p.shape[2], c),
                lambda bi, i: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_disp, th, w), lambda bi, i: (bi, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_disp, hp, w), jnp.float32),
        interpret=interpret,
    )(f1p, f2p)

    return jnp.transpose(out[:, :, :h, :], (0, 2, 3, 1))
