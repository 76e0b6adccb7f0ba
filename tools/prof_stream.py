"""Real-chip numbers for streaming video detection vs windowed re-compute.

Workload: stride-1 sliding-window video detection with YOLOv3T k=3
late-max (the reference's `--window 3 --every 1` serving shape) at 416px.

  windowed : one full (B, k, 416, 416, 3) apply per emitted detection —
             what detect_yolo3.py's window loop does (and all the
             reference can do).
  stream   : videoyolo_tpu/streaming.py step — one per-frame backbone
             pass + ring-buffer roll + join/head/NMS.

Both timed with the forced device_get barrier (block_until_ready can
return early over the axon tunnel — see tools/prof_temporal._force).
Expected ~2.5x at k=3 (backbone dominates; the per-window FPN/head is
also per-frame for late joins, so the stream step is close to a
single-frame YOLOv3).

--family picks the model: 'yolov3t' (k-frame late-max, default),
't5corr' / 't5plain' / 't5funnel' (the YOLOv3Temporal t=5 paths — corr
pyramid and funnel cache stage1 features only, so their stream step still
pays corr + mid-frame stages 2/3 + head per frame; expected speedup is the
stage1 share saved, not ~k).

Usage: python tools/prof_stream.py [--b 8] [--size 416] [--iters 20]
                                   [--family yolov3t]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import postprocess_tout
from videoyolo_tpu.models.yolo3_temporal import YOLOv3T, YOLOv3Temporal
from videoyolo_tpu.streaming import make_streaming_step, split_temporal_variables


def _force(o):
    jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1])


def timeit(f, *args, iters=20):
    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _force(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8, help="parallel streams")
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--classes", type=int, default=20)
    ap.add_argument(
        "--family", default="yolov3t",
        choices=["yolov3t", "rnnout", "t5corr", "t5plain", "t5funnel"],
    )
    args = ap.parse_args()

    if args.family == "yolov3t":
        model = YOLOv3T(
            num_classes=args.classes, k=args.k, k_join_type="max",
            k_join_pos="late", dtype=jnp.bfloat16,
        )
    elif args.family == "rnnout":
        # 1x1 output conv-GRU over the window (yolo3.py:63-66); streams on
        # the tip-cache deep split like the plain late joins
        model = YOLOv3T(
            num_classes=args.classes, k=args.k, k_join_type="max",
            rnn_pos="out", dtype=jnp.bfloat16,
        )
    else:
        args.k = 5
        model = YOLOv3Temporal(
            num_classes=args.classes, t=5,
            corr_d=2 if args.family == "t5corr" else 0,
            t_out=args.family != "t5funnel",
            dtype=jnp.bfloat16,
        )
    rs = np.random.RandomState(0)
    win = jnp.asarray(
        rs.rand(args.b, args.k, args.size, args.size, 3), jnp.bfloat16
    )
    frame = win[:, -1]
    variables = jax.device_put(
        model.init(jax.random.PRNGKey(0), win, train=False)
    )

    def _post(boxes, scores):
        return postprocess_tout(boxes, scores)

    # windowed: full k-frame apply per detection (weights closed over —
    # params-as-arguments costs ~4 s/call over the tunnel, ROADMAP)
    win_step = jax.jit(
        lambda x: _post(*model.apply(variables, x, train=False))
    )
    ms_win = timeit(win_step, win, iters=args.iters)

    # stream: one backbone pass per frame on the cached window
    embed_fn, step_fn = make_streaming_step(model, variables)
    embed = jax.jit(embed_fn)
    step = jax.jit(step_fn)
    bufs = tuple(jnp.repeat(r[:, None], args.k, axis=1) for r in embed(frame))
    ms_stream = timeit(step, bufs, frame, iters=args.iters)

    out = {
        "family": args.family, "b": args.b, "k": args.k, "size": args.size,
        "windowed_ms": round(ms_win, 2),
        "windowed_fps": round(args.b / ms_win * 1e3, 1),
        "stream_ms": round(ms_stream, 2),
        "stream_fps": round(args.b / ms_stream * 1e3, 1),
        "speedup": round(ms_win / ms_stream, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
