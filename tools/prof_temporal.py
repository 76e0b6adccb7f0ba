"""Real-chip numbers for the temporal family + the Pallas correlation kernel.

clip_fps counts CLIPS (windows) per second; frame throughput is k x that.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache2")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.factory import YoloConfig, build_model
from videoyolo_tpu.models.yolo3 import postprocess


def timeit(f, *args, iters=10):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_cfg(name, cfg, b, k, s=416):
    model = build_model(cfg)
    x = jnp.asarray(
        np.random.RandomState(0).rand(b, k, s, s, 3), jnp.bfloat16
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, k, s, s, 3), jnp.bfloat16), train=False
    )

    @jax.jit
    def step(im):
        boxes, scores = model.apply(variables, im, train=False)
        if boxes.ndim == 4:
            bt = boxes.shape[0] * boxes.shape[1]
            return postprocess(
                boxes.reshape((bt,) + boxes.shape[2:]),
                scores.reshape((bt,) + scores.shape[2:]),
            )
        return postprocess(boxes, scores)

    ms = timeit(step, x)
    return {"ms": round(ms, 2), "clip_fps": round(b / ms * 1e3, 1), "frame_fps": round(b * k / ms * 1e3, 1)}


res = {}
res["yolov3t_k3_late_max_b32"] = bench_cfg(
    "t_k3", YoloConfig(num_classes=30, k=3, k_join_type="max", k_join_pos="late", dtype=jnp.bfloat16), 32, 3
)
print("k3", res["yolov3t_k3_late_max_b32"], flush=True)
res["yolov3temporal_t5_b16"] = bench_cfg(
    "temp", YoloConfig(num_classes=30, temporal=True, t_out=True, corr_pos="early", corr_d=4, dtype=jnp.bfloat16), 16, 5
)
print("t5", res["yolov3temporal_t5_b16"], flush=True)

# pallas correlation vs XLA fallback
from videoyolo_tpu.ops import correlation as C
from videoyolo_tpu.ops import pallas_correlation as PC
rs = np.random.RandomState(0)
f1 = jnp.asarray(rs.rand(16, 26, 26, 256), jnp.float32)
f2 = jnp.asarray(rs.rand(16, 26, 26, 256), jnp.float32)
try:
    xla_fn = jax.jit(lambda a, b: C.correlation(a, b, max_displacement=4, stride2=1))
    pl_fn = jax.jit(lambda a, b: PC.correlation_pallas(a, b, max_displacement=4))
    res["corr_xla_ms"] = round(timeit(xla_fn, f1, f2), 3)
    res["corr_pallas_ms"] = round(timeit(pl_fn, f1, f2), 3)
    out_a = np.asarray(xla_fn(f1, f2))
    out_b = np.asarray(pl_fn(f1, f2))
    res["corr_max_abs_diff"] = float(np.max(np.abs(out_a - out_b)))
except Exception as e:
    res["corr_error"] = f"{type(e).__name__}: {str(e)[:200]}"
print(json.dumps(res))
