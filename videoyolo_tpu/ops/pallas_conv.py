"""Pallas int8 stride-2 downsample convolution (the fused-int8 hot spot).

The darknet downsample cells (3x3 stride-2 conv-BN-leaky,
`/root/reference/models/definitions/darknet/darknet.py:45-95` downsample
convs) are the worst-served layers of the int8 detect step under XLA: the
stage1/2/3 downsamples run at 57-81 int8-TOPS (3.98 + 3.31 + 2.81 ms of the
45.9 ms B=128/416 step, tools/prof_int8_trace.py) while the deep 3x3 cells
hit 370-430 TOPS.  This kernel reformulates the stride-2 conv on the
space-to-depth grid, where it becomes a dense stride-1 2x2 conv:

  input  (B, H, W, C) int8   --s2d-->  (B, H/2, W/2, 4C) int8
  output (h', w') = sum_{dh, dw in {0,1}}  s2d[h'-1+dh, w'-1+dw] @ W2[dh, dw]

with W2[dh, dw] a (4C, Cout) tap matrix scattered from the 3x3 kernel
(phase combinations that don't occur in a tap cell are zero rows).  Each
grid step computes RB output rows as four (RB*W', 4C) x (4C, Cout) MXU
matmuls with int32 accumulation — contraction 4C (128..512) instead of the
strided 9-tap gather XLA emits — then applies the folded-BN dequant + leaky
+ requant epilogue and writes int8.

Toolchain constraints that shaped the layout (probed on this Mosaic
build): one-column sublane shifts are impossible in-kernel (unaligned
memref slices are rejected; non-zero-offset value slices / pads / int8
rotates hang the compiler) and `make_async_copy` crashes the remote
compile helper outright.  So the TWO column alignments the 2x2 taps need
are materialised on the XLA side as a stacked pair of padded views
(`v in {0, 1}`: left-pad 1 / 0 columns) and the kernel receives the whole
padded image as an auto-pipelined VMEM block whose *untiled* leading dims
(rows, view) carry every halo offset — no in-kernel shifts, no DMA.

MEASURED NEGATIVE RESULT (kernel kept for the record, default OFF):
that stacked-view workaround doubles the downsample's activation reads on
a step that is already memory-bound — full fused-int8 detect at B=128/416
measures 45.1 ms plain vs 84.2 ms with these kernels enabled (0.54x,
tools/prof_pallas_ds.py --mode e2e).  `pallas_int8=False` everywhere; the
XLA strided int8 conv emitter is the shipped path.  See ROADMAP.md
"Mosaic/Pallas constraints" for the full economics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pack_downsample_weights",
    "int8_s2d_downsample_conv",
    "pallas_quant_downsample",
    "xla_s2d_downsample",
]

LEAKY_SLOPE = 0.1


def pack_downsample_weights(qkernel):
    """(3, 3, C, F) int8 HWIO -> (4, 4C, F) packed s2d tap matrices.

    Tap cell (dh, dw) covers input s2d cell (h'-1+dh, w'-1+dw); its row
    block for phase (pr, pc) holds kernel tap (kh, kw) where
    kh = 0 if (dh, pr) == (0, 1); kh = 1 if (dh, pr) == (1, 0); kh = 2 if
    (dh, pr) == (1, 1) — and 0 rows for phase combinations with no tap.
    Works under jit (pure jnp) so the packing fuses into the serving graph.
    """
    k = qkernel
    c, f = k.shape[2], k.shape[3]
    zeros = jnp.zeros((c, f), k.dtype)

    def tap(dh, pr, dw, pc):
        kh = {(0, 1): 0, (1, 0): 1, (1, 1): 2}.get((dh, pr))
        kw = {(0, 1): 0, (1, 0): 1, (1, 1): 2}.get((dw, pc))
        if kh is None or kw is None:
            return zeros
        return k[kh, kw]

    cells = []
    for dh in (0, 1):
        for dw in (0, 1):
            rows = [tap(dh, pr, dw, pc) for pr in (0, 1) for pc in (0, 1)]
            cells.append(jnp.concatenate(rows, axis=0))  # (4C, F)
    return jnp.stack(cells, axis=0)  # (4, 4C, F)


def _kernel(x_ref, w_ref, scale_ref, bias_ref, oscale_ref, out_ref):
    """x_ref: (1, H'+1, 2, Wp, 4C) — view v at row i, col j holds s2d cell
    (i-1, j-1+v); rows and views are untiled dims, so every tap is an
    offset-free slice."""
    rb, wout, cout = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    c4 = x_ref.shape[4]
    r = pl.program_id(1)
    rs = r * rb

    acc = jnp.zeros((rb * wout, cout), jnp.int32)
    for dh in (0, 1):
        for dw in (0, 1):
            t = x_ref[0, pl.ds(rs + dh, rb), dw]  # (rb, Wp, 4C)
            patch = jax.lax.slice(t, (0, 0, 0), (rb, wout, c4))
            a = patch.reshape(rb * wout, c4)
            acc = acc + jnp.dot(
                a, w_ref[2 * dh + dw], preferred_element_type=jnp.int32
            )
    y = acc.astype(jnp.float32) * scale_ref[0][None, :] + bias_ref[0][None, :]
    y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    q = jnp.clip(jnp.round(y * oscale_ref[0, 0]), -127, 127)  # reciprocal scale
    out_ref[0] = q.astype(jnp.int8).reshape(rb, wout, cout)


def _round8(n):
    return ((n + 7) // 8) * 8


@functools.partial(jax.jit, static_argnames=("row_block", "interpret"))
def int8_s2d_downsample_conv(x_s2d, w2, scale, bias, oscale, row_block=16,
                             interpret=False):
    """(B, H', W', 4C) int8 s2d input -> (B, H', W', F) int8.

    w2: (4, 4C, F) int8 from pack_downsample_weights; scale: (F,) f32
    (input scale x folded per-channel weight scale); bias (F,) f32; oscale
    scalar f32 (the cell's calibrated output scale).
    """
    b, hp_, wp_, c4 = x_s2d.shape
    f = w2.shape[-1]
    rb = row_block
    nr = pl.cdiv(hp_, rb)
    wp = _round8(wp_ + 1)
    # the two column alignments, stacked on an untiled dim: view 0 = cells
    # at (i-1, j-1) (left halo), view 1 = cells at (i-1, j)
    x0 = jnp.pad(x_s2d, ((0, 0), (1, 0), (1, wp - 1 - wp_), (0, 0)))
    x1 = jnp.pad(x_s2d, ((0, 0), (1, 0), (0, wp - wp_), (0, 0)))
    xboth = jnp.stack([x0, x1], axis=2)  # (B, H'+1, 2, Wp, 4C)
    # row padding so the last row-block's dh=1 slice stays in bounds
    extra = nr * rb + 1 - (hp_ + 1)
    if extra > 0:
        xboth = jnp.pad(xboth, ((0, 0), (0, extra), (0, 0), (0, 0), (0, 0)))

    grid = (b, nr)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp_, wp_, f), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, nr * rb + 1, 2, wp, c4),
                lambda bb, rr: (bb, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rb, wp_, f), lambda bb, rr: (bb, rr, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp_ * wp_ * 4 * c4 * f,
            bytes_accessed=b * hp_ * wp_ * (2 * c4 + f),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xboth,
        w2,
        scale.reshape(1, f),
        bias.reshape(1, f),
        (1.0 / jnp.asarray(oscale, jnp.float32)).reshape(1, 1),
    )
    return out


def space_to_depth_i8(q):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major — the int8 twin of
    models/darknet.space_to_depth."""
    b, h, w, c = q.shape
    q = q.reshape(b, h // 2, 2, w // 2, 2, c)
    q = q.transpose(0, 1, 3, 2, 4, 5)
    return q.reshape(b, h // 2, w // 2, 4 * c)


def xla_s2d_downsample(q_in, qkernel, scale, bias, oscale):
    """The same s2d reformulation emitted through XLA's dense conv path:
    s2d fold (int8, free layout change) + dense 2x2 stride-1 int8 conv with
    the packed tap matrices + fused dequant/leaky/requant epilogue.

    Unlike the Pallas kernel this needs NO stacked halo views — XLA's conv
    handles the (1, 0) top/left halo natively — so the activation is read
    once.  The packed kernel wastes 7/16 of the MACs on structurally-zero
    rows, but the contraction is dense (16C deep instead of a 9-tap strided
    gather), which is exactly the regime where the int8 MXU emitter was
    measured at 370-430 TOPS vs 57-81 for the strided original.

    q_in: (B, H, W, C) int8 (H, W even); qkernel (3, 3, C, F) int8;
    scale (F,) f32 = s_x * wscale; bias (F,) f32; oscale scalar f32.
    Returns (B, H/2, W/2, F) int8 quantised with oscale.
    """
    w2 = pack_downsample_weights(qkernel)  # (4, 4C, F), cell order dh*2+dw
    c4, f = w2.shape[1], w2.shape[2]
    w2 = w2.reshape(2, 2, c4, f)  # HWIO with kh=dh, kw=dw
    xs = space_to_depth_i8(q_in)  # (B, H/2, W/2, 4C)
    dn = jax.lax.conv_dimension_numbers(xs.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * scale + bias
    yf = jnp.where(yf > 0, yf, LEAKY_SLOPE * yf)
    q = jnp.clip(jnp.round(yf / oscale), -127, 127)
    return q.astype(jnp.int8)


def pallas_quant_downsample(q_in, qkernel, scale, bias, oscale, row_block=16,
                            interpret=False):
    """Full fused-int8 downsample cell: s2d fold (XLA, int8) + Pallas conv.

    q_in: (B, H, W, C) int8; qkernel: (3, 3, C, F) int8; scale (F,) f32 =
    s_x * wscale; bias (F,) f32; oscale scalar.  Returns (B, H/2, W/2, F)
    int8 quantised with oscale.
    """
    w2 = pack_downsample_weights(qkernel)
    return int8_s2d_downsample_conv(
        space_to_depth_i8(q_in), w2, scale, bias, oscale, row_block=row_block,
        interpret=interpret,
    )
