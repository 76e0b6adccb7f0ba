"""Streaming video detection: windowed-equivalence contract.

The claim under test (videoyolo_tpu/streaming.py): after reset(f0) and
steps f1..fi, step(fi) returns exactly what the full YOLOv3T window apply
+ postprocess return on (f[i-k+1], ..., fi) (left-padded with f0) — while
paying only ONE backbone pass per frame.  The reference has no streaming
path at all (its window loop re-runs all k frames per detection,
detect_yolo3.py / yolo3.py:915).  Conv-RNN configs stream too: the
reference RNN scans the window from zero state every call (yolo3.py:
267-306), so re-scanning the cached route window in the head is exact."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoyolo_tpu.models.yolo3 import postprocess
from videoyolo_tpu.models.yolo3_temporal import YOLOv3T, YOLOv3Temporal
from videoyolo_tpu.streaming import (
    StreamingDetector,
    export_streaming_detector,
    load_streaming_detector,
    split_temporal_variables,
)

S = 64
K = 3


def _frames(n, seed=0):
    rs = np.random.RandomState(seed)
    return [jnp.asarray(rs.rand(1, S, S, 3).astype(np.float32)) for _ in range(n)]


def _window(frames, i, k=K):
    """Stream semantics: window ending at frame i, left-padded with f0."""
    idx = [max(0, j) for j in range(i - k + 1, i + 1)]
    return jnp.stack([frames[j] for j in idx], axis=1)


def _assert_dets_match(got, want, rtol=1e-4, atol=1e-4):
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=rtol, atol=atol)


def _apply_windowed(model, variables, x):
    """model.apply + postprocess, with the t_out fold-T-into-batch NMS
    convention (same as serving.export_detector / streaming step_fn)."""
    boxes, scores = model.apply(variables, x, train=False)
    if boxes.ndim == 4:
        b, t = boxes.shape[:2]
        dets = postprocess(
            boxes.reshape((b * t,) + boxes.shape[2:]),
            scores.reshape((b * t,) + scores.shape[2:]),
        )
        return tuple(a.reshape((b, t) + a.shape[1:]) for a in dets)
    return postprocess(boxes, scores)


def _check_stream_matches_windows(model, variables, frames, k=K):
    stream = StreamingDetector(model, variables)
    apply = jax.jit(lambda x: _apply_windowed(model, variables, x))
    dets = [stream.reset(frames[0])]
    dets += [stream.step(f) for f in frames[1:]]
    for i, got in enumerate(dets):
        _assert_dets_match(got, apply(_window(frames, i, k)))


@pytest.mark.parametrize(
    "cfg",
    [
        dict(k_join_type="max", k_join_pos="late"),
        dict(k_join_type="cat", k_join_pos="early"),
        dict(corr_pos="late", corr_d=2),
        dict(rnn_pos="late", k_join_type="max", k_join_pos="late"),
        dict(rnn_pos="out", k_join_type="max", k_join_pos="early"),
    ],
    ids=["late-max", "early-cat", "corr-late", "rnn-late", "rnn-out"],
)
def test_stream_equals_windowed(cfg):
    model = YOLOv3T(num_classes=3, k=K, **cfg)
    frames = _frames(K + 2)
    variables = model.init(jax.random.PRNGKey(0), _window(frames, 0), train=False)
    _check_stream_matches_windows(model, variables, frames)


@pytest.mark.parametrize(
    "cfg",
    [
        dict(t_out=True, corr_d=2),
        dict(t_out=True, corr_d=0),
        dict(t_out=False, corr_d=0),
    ],
    ids=["t5-corr-pyramid", "t5-plain-tout", "t5-funnel"],
)
def test_stream_t5_equals_windowed(cfg):
    """YOLOv3Temporal streams at its natural split: whole-backbone caching
    for the plain t_out path, stage1-feature caching for the corr-pyramid
    and funnel paths (stages 2/3 consume window-mixed features and re-run
    per step).  t_out outputs come back (B, T, P, ...), offset-major."""
    t = 5
    model = YOLOv3Temporal(num_classes=3, t=t, **cfg)
    frames = _frames(t + 2, seed=5)
    variables = model.init(
        jax.random.PRNGKey(0), _window(frames, 0, t), train=False
    )
    _check_stream_matches_windows(model, variables, frames, k=t)


def test_stream_t5_int8_static():
    """The t=5 corr-pyramid path streams quantized too (per-cell static
    scales are constants, split cleanly by module name)."""
    from videoyolo_tpu.ops.quantize import quantize_static

    t = 5
    model = YOLOv3Temporal(num_classes=3, t=t, corr_d=2)
    frames = _frames(t + 1, seed=11)
    w0 = _window(frames, 0, t)
    variables = model.init(jax.random.PRNGKey(2), w0, train=False)
    qmodel, qvars = quantize_static(model, variables, [w0])
    _check_stream_matches_windows(qmodel, qvars, frames, k=t)


def test_export_streaming_t5_roundtrip(tmp_path):
    """The corr-pyramid streaming step exports with its single stage1
    buffer: call(buf, frame) -> (buf', ids, scores, boxes)."""
    t = 5
    model = YOLOv3Temporal(num_classes=3, t=t, corr_d=2)
    frames = _frames(t, seed=13)
    variables = model.init(
        jax.random.PRNGKey(0), _window(frames, 0, t), train=False
    )
    path = export_streaming_detector(
        model, variables, str(tmp_path / "s.stablehlo"), batch_size=1, size=S
    )
    call = load_streaming_detector(path)
    assert len(call.in_avals) == 2  # one stage1 buffer + the frame
    bufs = tuple(jnp.zeros(a.shape, a.dtype) for a in call.in_avals[:-1])
    for f in frames:
        *bufs, ids, scores, boxes = call(*bufs, f)
        bufs = tuple(bufs)
    # t frames through zero-seeded buffers fill the window exactly
    want = _apply_windowed(model, variables, jnp.stack(frames, axis=1))
    _assert_dets_match((ids, scores, boxes), want)


def test_stream_int8_static():
    """The int8 serving path streams too: static scales are per-cell
    constants, so per-frame embeds equal the TimeDistributed fold."""
    from videoyolo_tpu.ops.quantize import quantize_static

    model = YOLOv3T(num_classes=3, k=K, k_join_type="max", k_join_pos="late")
    frames = _frames(K + 1, seed=7)
    w0 = _window(frames, 0)
    variables = model.init(jax.random.PRNGKey(1), w0, train=False)
    qmodel, qvars = quantize_static(model, variables, [w0])
    _check_stream_matches_windows(qmodel, qvars, frames)


def test_stream_center_matches_reference_windows():
    """anchor='center' reproduces the reference's per-frame window sampler
    exactly (frame m <- frames m-half..m+half clamped by edge repetition,
    imgnetvid.py:480-506 / data/imgnetvid.py:297-315): every frame of the
    clip gets bit-identical detections to the windowed detect path, at one
    backbone pass per frame.  Exactly len(frames) outputs, in frame order."""
    from videoyolo_tpu.streaming import stream_frames

    model = YOLOv3T(num_classes=3, k=K, k_join_type="max", k_join_pos="late")
    frames = _frames(6, seed=9)
    variables = model.init(jax.random.PRNGKey(0), _window(frames, 0), train=False)
    stream = StreamingDetector(model, variables)
    apply = jax.jit(lambda x: _apply_windowed(model, variables, x))

    got = list(stream_frames(stream, iter(frames), anchor="center"))
    assert [m for m, _ in got] == list(range(len(frames)))
    half = K // 2
    for m, dets in got:
        idx = [min(max(0, m + d), len(frames) - 1) for d in range(-half, half + 1)]
        want = apply(jnp.stack([frames[j] for j in idx], axis=1))
        _assert_dets_match(dets, want)


def test_split_variables_partition():
    model = YOLOv3T(num_classes=3, k=K, k_join_type="max", k_join_pos="late")
    x = jnp.zeros((1, K, S, S, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    embed, head = split_temporal_variables(variables)
    assert set(embed["params"]) == {"stage1", "stage2", "stage3"}
    assert "stage1" not in head["params"] and "block0" in head["params"]
    n = lambda t: len(jax.tree_util.tree_leaves(t))
    assert n(embed) + n(head) == n(variables)


def test_export_streaming_roundtrip(tmp_path):
    """The pure step exports as one StableHLO artifact:
    (buf1, buf2, buf3, frame) -> (buf1', buf2', buf3', ids, scores, boxes);
    zero-seeded buffers + k steps reach the same state/detections as the
    in-process stream fed the same frames after its buffer fills."""
    model = YOLOv3T(num_classes=3, k=K, k_join_type="max", k_join_pos="late")
    frames = _frames(K + 1, seed=3)
    variables = model.init(jax.random.PRNGKey(0), _window(frames, 0), train=False)

    path = export_streaming_detector(
        model, variables, str(tmp_path / "stream.stablehlo"), batch_size=1, size=S
    )
    call = load_streaming_detector(path)
    bufs = tuple(jnp.zeros(a.shape, a.dtype) for a in call.in_avals[:3])
    for f in frames:
        *bufs, ids, scores, boxes = call(*bufs, f)
        bufs = tuple(bufs)

    # after k+1 frames every zero-seed slot has been rolled out; the window
    # is (f1, f2, f3) exactly
    want = postprocess(*model.apply(variables, jnp.stack(frames[1:], axis=1), train=False))
    _assert_dets_match((ids, scores, boxes), want)
