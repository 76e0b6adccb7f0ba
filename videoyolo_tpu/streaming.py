"""Streaming video detection: sliding-window inference at per-frame cost.

The reference detects on videos by re-running the full k-frame window for
every output (detect_yolo3.py window loop; yolo3.py:915 YOLOV3T takes the
whole (B, k, H, W, 3) stack each call), so stride-1 video detection costs
k backbone passes per emitted detection.  But for every non-RNN YOLOv3T
config the darknet53 stages are strictly per-frame (TimeDistributed —
models/yolo3_temporal.py:236-242): consecutive windows share k-1 frames of
backbone compute.  This module splits the model at that boundary and keeps
a ring buffer of per-frame route features on device, so each new frame
pays ONE backbone pass + the (cheap, per-window) join/head/NMS — a ~k×
serving win on exactly the workload the temporal family exists for.

TPU-first shape: the stream state is an explicit functional carry (three
stacked (B, k, ...) route buffers), the step is one jitted pure function
(carry, frame) -> (carry, detections), and `export_streaming_detector`
serializes that step as a portable StableHLO artifact — a stateful video
detector with the state in the caller's hands, which is also exactly the
form a pjit/shard_map deployment wants (B = independent streams, shardable
on the batch axis).

    stream = StreamingDetector(model, variables)     # YOLOv3T, non-RNN
    dets = stream.reset(first_frame)                 # buffer <- k × frame0
    for frame in frames:
        ids, scores, boxes = stream.step(frame)      # one backbone pass

Windowed-equivalence contract: after reset(f0) and steps f1..fn, step(fi)
returns bit-for-bit what `model.apply` + `postprocess` return on the
window (f[i-k+1], ..., fi) (left-padded with f0 at the stream head) —
tests/test_streaming.py locks this for late/early joins and the
correlation configs, plain and int8.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .models.darknet import Darknet53Stage1, DarknetStage
from .models.yolo3 import postprocess
from .models.yolo3_temporal import YOLOv3T

__all__ = [
    "StreamingDetector",
    "split_temporal_variables",
    "export_streaming_detector",
    "load_streaming_detector",
]

_STAGE_NAMES = ("stage1", "stage2", "stage3")


class _RoutesBackbone(nn.Module):
    """Identity 'backbone': the model input already IS the route tuple.
    Lets the unmodified YOLOv3T graph act as the per-window head."""

    quant: Any = False

    def __call__(self, x, train: bool = False):
        return x


class _StageRoutes(nn.Module):
    """Per-frame darknet53 route extractor with the exact top-level module
    names YOLOv3T uses (stage1/2/3, yolo3_temporal.py:230-233), so the full
    model's variables split cleanly by name."""

    quant: Any = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        routes = []
        y = x
        for stage in (
            Darknet53Stage1(name="stage1", quant=self.quant, dtype=self.dtype),
            DarknetStage(512, 8, name="stage2", quant=self.quant, dtype=self.dtype),
            DarknetStage(1024, 4, name="stage3", quant=self.quant, dtype=self.dtype),
        ):
            y = stage(y, train)
            routes.append(y)
        return tuple(routes)


def split_temporal_variables(variables) -> Tuple[dict, dict]:
    """Split a YOLOv3T variables tree into (embed_vars, head_vars) by
    top-level module name: the stage1/2/3 subtrees drive `_StageRoutes`,
    everything else (blocks, transitions, outputs, corr) drives the
    routes-in head.  Works for f32/bf16 and every int8 variant — quantised
    cell params (qkernel/wscale/xscale/...) live inside the same subtrees."""
    embed, head = {}, {}
    for col, tree in variables.items():
        e = {k: v for k, v in tree.items() if k in _STAGE_NAMES}
        h = {k: v for k, v in tree.items() if k not in _STAGE_NAMES}
        if e:
            embed[col] = e
        if h:
            head[col] = h
    return embed, head


def _check_streamable(model) -> None:
    assert type(model) is YOLOv3T, (
        "streaming covers the YOLOv3T family (built-in darknet53 backbone); "
        "YOLOv3Temporal's corr/funnel paths mix stages across time and "
        "cannot reuse per-frame features"
    )
    assert model.backbone is None, (
        "streaming needs the built-in per-frame backbone (custom temporal "
        "backbones own their time mixing)"
    )
    assert model.rnn_pos is None, (
        "conv-RNN tips re-scan the window from zero state each call; "
        "stream them with an explicit-state export instead (ROADMAP)"
    )
    assert model.k and model.k > 1, "streaming needs a temporal window (k > 1)"


def make_streaming_step(
    model,
    variables,
    nms_thresh: float = 0.45,
    nms_topk: int = 400,
    post_nms: int = 100,
) -> Tuple[Callable, Callable]:
    """(embed_fn, step_fn) for a YOLOv3T model.

    embed_fn(frame (B,H,W,3)) -> per-frame routes tuple — used to seed the
    ring buffer.  step_fn(buffers, frame) -> (buffers', (ids, scores,
    boxes)) — the pure streaming step: one backbone pass, ring-buffer roll,
    join/head/NMS on the cached window.  Both close over the (split)
    variables; jit-wrap at the call site (StreamingDetector does)."""
    _check_streamable(model)
    embed_vars, head_vars = split_temporal_variables(variables)
    embed_model = _StageRoutes(quant=model.quant, dtype=model.dtype)
    head_model = model.clone(backbone=_RoutesBackbone(quant=model.quant))

    def embed_fn(frame):
        return embed_model.apply(embed_vars, frame, train=False)

    def step_fn(buffers, frame):
        new = embed_fn(frame)
        buffers = tuple(
            jnp.concatenate([buf[:, 1:], r[:, None]], axis=1)
            for buf, r in zip(buffers, new)
        )
        boxes, scores = head_model.apply(head_vars, buffers, train=False)
        dets = postprocess(
            boxes, scores, nms_thresh=nms_thresh, nms_topk=nms_topk,
            post_nms=post_nms,
        )
        return buffers, dets

    return embed_fn, step_fn


class StreamingDetector:
    """Stateful wrapper around the pure streaming step (state stays an
    explicit jax carry internally; this class just holds it between calls).

    B (streams) and the frame size are fixed at first use; `reset(frame)`
    seeds the ring buffer by replicating the first frame's routes (the
    stream-head padding convention) and returns that window's detections.
    """

    def __init__(
        self,
        model,
        variables,
        nms_thresh: float = 0.45,
        nms_topk: int = 400,
        post_nms: int = 100,
    ):
        self.k = model.k
        embed_fn, step_fn = make_streaming_step(
            model, variables, nms_thresh=nms_thresh, nms_topk=nms_topk,
            post_nms=post_nms,
        )
        self._embed = jax.jit(embed_fn)
        self._step = jax.jit(step_fn)
        self._buffers = None

    def reset(self, frame):
        """Seed the buffer with k copies of `frame`'s routes; returns the
        detections for the (frame, ..., frame) window."""
        routes = self._embed(frame)
        self._buffers = tuple(
            jnp.repeat(r[:, None], self.k, axis=1) for r in routes
        )
        # one step on the same frame: rolling a k×frame0 buffer and appending
        # frame0 again leaves it k×frame0, so step()'s window semantics hold
        # for reset()'s output too (no second code path)
        self._buffers, dets = self._step(self._buffers, frame)
        return dets

    def step(self, frame):
        """Advance the stream one frame -> (ids, scores, boxes) for the
        window ending at `frame`."""
        assert self._buffers is not None, "call reset(first_frame) first"
        self._buffers, dets = self._step(self._buffers, frame)
        return dets


def export_streaming_detector(
    model,
    variables,
    path: str,
    batch_size: int = 1,
    size: int = 416,
    input_dtype: Any = None,
    nms_thresh: float = 0.45,
    nms_topk: int = 400,
    post_nms: int = 100,
    platforms: Optional[Tuple[str, ...]] = None,
) -> str:
    """Serialize the pure streaming step as a StableHLO artifact:
    call(buf1, buf2, buf3, frame) -> (buf1', buf2', buf3', ids, scores,
    boxes), weights baked in.  The caller owns the carry — seed it with
    `load_streaming_detector(path).init(frame)` semantics (replicate a
    first-frame embed, or zeros).  Returns `path`."""
    _check_streamable(model)
    embed_fn, step_fn = make_streaming_step(
        model, variables, nms_thresh=nms_thresh, nms_topk=nms_topk,
        post_nms=post_nms,
    )
    dtype = input_dtype or jnp.float32
    frame = jax.ShapeDtypeStruct((batch_size, size, size, 3), dtype)
    route_shapes = jax.eval_shape(embed_fn, frame)
    bufs = tuple(
        jax.ShapeDtypeStruct((batch_size, model.k) + r.shape[1:], r.dtype)
        for r in route_shapes
    )

    def flat_step(b1, b2, b3, images):
        (n1, n2, n3), (ids, scores, boxes) = step_fn((b1, b2, b3), images)
        return n1, n2, n3, ids, scores, boxes

    exported = jax.export.export(
        jax.jit(flat_step), platforms=list(platforms) if platforms else None
    )(*bufs, frame)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_streaming_detector(path: str) -> Callable:
    """Load a streaming artifact -> callable(buf1, buf2, buf3, frame) ->
    (buf1', buf2', buf3', ids, scores, boxes).  Buffer shapes/dtypes are on
    `.in_avals` of the deserialized export; zeros are a valid seed."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    call = jax.jit(exported.call)
    call.in_avals = exported.in_avals  # seed-shape discovery for callers
    return call
