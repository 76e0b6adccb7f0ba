"""Headline benchmark: yolo3_darknet53 detection throughput at 416 px.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); the accepted
proxy for "reference GPU frames/sec/chip" is gluoncv's yolo3_darknet53
inference throughput on one V100 (~70 fps at 416 with batching).  The north
star is >=5x that per chip (BASELINE.json), i.e. vs_baseline >= 5.0.

Runs the full inference step — backbone + FPN + decode + on-device NMS —
in bfloat16 on the first available device, steady-state timed.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# persistent compile cache: first-compile of the full graph via the remote
# compiler is ~5 min; repeat bench runs should be seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REFERENCE_FPS = 70.0  # documented proxy, see module docstring
BATCH = 128  # measured sweet spot on v5e (amortises per-launch overhead)
SIZE = 416
WARMUP = 3
ITERS = 20


def main():
    from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess

    model = YOLOv3(num_classes=20, dtype=jnp.bfloat16)
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16), train=False)

    @jax.jit
    def step(images):
        boxes, scores = model.apply(variables, images, train=False)
        return postprocess(boxes, scores)

    out = step(x)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(step(x))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "detect_fps_416_bf16_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / REFERENCE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
