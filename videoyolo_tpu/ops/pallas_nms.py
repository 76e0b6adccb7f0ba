"""Pallas TPU kernel for batched greedy NMS.

The BASELINE north star calls for the reference's `F.contrib.box_nms`
(yolo3.py:525-530) to become an on-device batched Pallas kernel.  This
kernel runs the whole greedy scan in VMEM with the candidates resident
on-chip.

MEASURED OUTCOME (v5e, B=128, K=400): this kernel is ~6x SLOWER than the
vmapped XLA scan in ops/nms.py (10.8ms vs 1.7ms) — the pallas grid runs its
B programs sequentially (B x 400 scalar steps), while XLA's vmapped
fori_loop runs ONE 400-step loop whose every step updates all B keep rows as
a single (B, K) vector op.  The greedy scan is latency-bound, not
bandwidth-bound, so VMEM residency buys nothing.  `ops/nms.box_nms` (XLA)
therefore stays the production path; this kernel is kept as the
bit-equivalent Pallas implementation (tested in interpret mode and on
hardware) and as a template for kernels where on-chip residency does pay
(see pallas_correlation.py, ~10x the XLA form).

Design notes (Mosaic constraints shape the algorithm):
  * inputs arrive component-major (B, 6, K): K on lanes keeps every
    per-candidate vector op dense, and the IoU matrix (K, K) sits on
    (sublane, lane) tiles;
  * the greedy scan cannot dynamically index sublane rows (alignment), so it
    runs BLOCKED: for each 8-row block (statically offset), the 8 scalar
    steps select their suppression row with an iota mask + reduce instead of
    a dynamic slice;
  * suppression uses the precomputed boolean matrix
    (iou > thr) & same_class & upper_triangle, so each step is one
    masked-AND over the keep row.

Semantics identical to ops/nms.box_nms on already-top-k candidates:
greedy in descending score order, class-aware unless force_suppress.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_scan_pallas"]


def _nms_kernel(dets_ref, keep_ref, suppress_ref, *, k, overlap_thresh,
                valid_thresh, force_suppress, block):
    d = dets_ref[0].astype(jnp.float32)  # (6, K): id, score, x1, y1, x2, y2
    ids, scores = d[0], d[1]
    x1, y1, x2, y2 = d[2], d[3], d[4], d[5]

    # pairwise IoU (K, K): rows i = suppressor, cols j = suppressed
    tlx = jnp.maximum(x1[:, None], x1[None, :])
    tly = jnp.maximum(y1[:, None], y1[None, :])
    brx = jnp.minimum(x2[:, None], x2[None, :])
    bry = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(brx - tlx, 0.0) * jnp.maximum(bry - tly, 0.0)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-15)

    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    suppress = (iou > overlap_thresh) & (col > row)
    if not force_suppress:
        suppress &= ids[:, None] == ids[None, :]
    # stash in VMEM scratch: the greedy scan slices 8-row blocks off a REF
    # (value dynamic_slice is not lowerable; ref pl.ds with a provable
    # multiple-of-8 sublane offset is)
    suppress_ref[:, :] = suppress.astype(jnp.int32)

    # int32 mask (bool vector loop carries fail Mosaic legalisation)
    keep = ((scores > valid_thresh) & (ids >= 0)).astype(jnp.int32)[None, :]

    rows8 = jax.lax.broadcasted_iota(jnp.int32, (block, k), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def outer(b, keep):
        blk = suppress_ref[pl.ds(pl.multiple_of(b * block, block), block), :]

        def inner(j, keep):
            gj = b * block + j
            # row j of the block and keep[gj], both via iota masks + reduce
            # (no sublane/lane dynamic indexing)
            row_j = jnp.sum(jnp.where(rows8 == j, blk, 0), axis=0)  # (K,) 0/1
            kept_j = jnp.sum(jnp.where(lane == gj, keep, 0)) > 0
            return jnp.where(kept_j, keep * (1 - row_j[None, :]), keep)

        return jax.lax.fori_loop(0, block, inner, keep)

    keep = jax.lax.fori_loop(0, k // block, outer, keep)
    keep_ref[0, 0] = keep[0]


@functools.partial(
    jax.jit,
    static_argnames=("overlap_thresh", "valid_thresh", "force_suppress", "interpret"),
)
def nms_scan_pallas(
    dets: jnp.ndarray,  # (B, K, 6) descending-score candidates
    overlap_thresh: float = 0.45,
    valid_thresh: float = 0.01,
    force_suppress: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-scan keep mask (B, K) int32 for sorted candidate rows."""
    b, k, six = dets.shape
    assert six == 6
    block = 8
    kp = ((k + 127) // 128) * 128  # pad K to a lane multiple
    if kp != k:
        pad = jnp.full((b, kp - k, 6), -1.0, dets.dtype)
        dets = jnp.concatenate([dets, pad], axis=1)
    comp = jnp.transpose(dets, (0, 2, 1))  # (B, 6, Kp)

    keep = pl.pallas_call(
        functools.partial(
            _nms_kernel,
            k=kp,
            overlap_thresh=overlap_thresh,
            valid_thresh=valid_thresh,
            force_suppress=force_suppress,
            block=block,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 6, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        # keep lives as (B, 1, Kp) so the block's trailing dims (1, Kp) match
        # the array dims (TPU block divisibility rule)
        out_specs=pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, kp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((kp, kp), jnp.int32)],
        interpret=interpret,
    )(comp)
    return keep[:, 0, :k]
