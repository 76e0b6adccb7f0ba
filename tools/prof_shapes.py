"""Deployment-shape sweep: detect throughput (bf16 + fused int8) across
input sizes on the real chip.

ROADMAP's int8 closure names deployment shape tuning as the remaining
serving lever; this produces the measured table (PARITY.md "serving
guidance").  Each size runs the full detect step (forward + decode + two-
stage top-k + NMS) at a per-size batch chosen to keep activation footprint
roughly constant (B x S^2 ~ 128 x 416^2).

The reference's eval protocol uses 416 (VOC/VID) and 608 (COCO-style
large), and the random-shape training buckets span 320-608
(/root/reference/train_yolov3.py:67-76), so those are the sizes a
deployment actually serves.

Timing per ROADMAP "Measurement discipline": distinct-enough inputs, warm
forced via device_get data round-trip, timed loop forced the same way.

Usage: python tools/prof_shapes.py [--sizes 320,416,512,608] [--iters 20]
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

from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.ops.quantize import quantize_fused


def batch_for(size: int) -> int:
    """Keep B*S^2 ~ 128*416^2 (the measured 416 sweet spot), floor 8,
    rounded down to a multiple of 8 (still sublane-friendly) so the larger
    sizes stay near the constant-footprint target instead of collapsing to
    a 32-multiple floor (512 -> 80 vs target 84; 608 -> 56 vs 60)."""
    b = int(128 * (416 / size) ** 2)
    return max(8, (b // 8) * 8)


def timeit_fps(step, xs, iters):
    """Cycle through pre-staged DISTINCT device buffers per iteration —
    repeated identical dispatch under-reports over the tunnel (same
    discipline as bench.py's stream section / ROADMAP)."""
    jax.device_get(step(xs[0])[0])
    jax.device_get(step(xs[-1])[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(xs[i % len(xs)])
    jax.device_get(out[0])
    return xs[0].shape[0] * iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="320,416,512,608")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--classes", type=int, default=20)
    args = ap.parse_args()

    rows = []
    for size in [int(s) for s in args.sizes.split(",")]:
        b = batch_for(size)
        model = YOLOv3(num_classes=args.classes, dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, size, size, 3), jnp.bfloat16),
            train=False,
        )
        rs = np.random.RandomState(0)
        xs = [
            jax.device_put(jnp.asarray(rs.rand(b, size, size, 3), jnp.bfloat16))
            for _ in range(3)
        ]

        bf16_step = jax.jit(
            lambda im, m=model, v=variables: postprocess(
                *m.apply(v, im, train=False)
            )
        )
        bf16_fps = timeit_fps(bf16_step, xs, args.iters)

        qmodel, qvars = quantize_fused(
            model, variables, [np.asarray(xs[0][:8], np.float32)]
        )
        int8_step = jax.jit(
            lambda im, m=qmodel, v=qvars: postprocess(
                *m.apply(v, im, train=False)
            )
        )
        int8_fps = timeit_fps(int8_step, xs, args.iters)

        row = {
            "size": size,
            "batch": b,
            "bf16_fps": round(bf16_fps, 1),
            "int8_fps": round(int8_fps, 1),
            "int8_speedup": round(int8_fps / bf16_fps, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
