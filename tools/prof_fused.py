"""Fused detect-graph variants, timed end-to-end at B=128/416/bf16.

v0: fwd only (floor)
v1: fwd + exact-topk select + NMS          (current postprocess)
v2: fwd + exact-topk select only (no NMS)
v3: fwd + approx_max_k(0.95) select + NMS
v4: fwd + per-box class-max prefilter to 400 boxes -> exact (box,class) topk + NMS
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.ops.nms import box_nms

B, S, C, K = 128, 416, 20, 400
model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
x = jnp.asarray(np.random.RandomState(0).rand(B, S, S, 3), jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False)


def timeit(f, *args, iters=20):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def select_exact(boxes, scores):
    b, n, c = scores.shape
    flat = scores.reshape(b, n * c)
    tv, ti = jax.lax.top_k(flat, K)
    bi, ci = ti // c, (ti % c).astype(boxes.dtype)
    tb = jnp.take_along_axis(boxes, bi[..., None], axis=1)
    return jnp.concatenate([ci[..., None], tv[..., None], tb], axis=-1)


def select_approx(boxes, scores):
    b, n, c = scores.shape
    flat = scores.reshape(b, n * c)
    tv, ti = jax.lax.approx_max_k(flat, K, recall_target=0.95)
    bi, ci = ti // c, (ti % c).astype(boxes.dtype)
    tb = jnp.take_along_axis(boxes, bi[..., None], axis=1)
    return jnp.concatenate([ci[..., None], tv[..., None], tb], axis=-1)


def select_prefilter(boxes, scores):
    b, n, c = scores.shape
    box_best = jnp.max(scores, axis=-1)            # (B,N)
    _, bidx = jax.lax.top_k(box_best, K)           # top 400 boxes
    sub_scores = jnp.take_along_axis(scores, bidx[..., None], axis=1)  # (B,400,C)
    sub_boxes = jnp.take_along_axis(boxes, bidx[..., None], axis=1)
    flat = sub_scores.reshape(b, K * c)
    tv, ti = jax.lax.top_k(flat, K)
    bi, ci = ti // c, (ti % c).astype(boxes.dtype)
    tb = jnp.take_along_axis(sub_boxes, bi[..., None], axis=1)
    return jnp.concatenate([ci[..., None], tv[..., None], tb], axis=-1)


def mk(select, with_nms=True):
    @jax.jit
    def f(im):
        boxes, scores = model.apply(variables, im, train=False)
        cands = select(boxes, scores)
        if not with_nms:
            return cands
        r = box_nms(cands, topk=-1)
        return r[..., 0:1], r[..., 1:2], r[..., 2:6]
    return f


fwd = jax.jit(lambda im: model.apply(variables, im, train=False))
res = {}
for name, f in [
    ("v0_fwd_only_ms", fwd),
    ("v1_exact_nms_ms", mk(select_exact)),
    ("v2_exact_nonms_ms", mk(select_exact, with_nms=False)),
    ("v3_approx_nms_ms", mk(select_approx)),
    ("v4_prefilter_nms_ms", mk(select_prefilter)),
]:
    res[name] = timeit(f, x)
    print(name, round(res[name], 3), "ms", round(B / res[name] * 1e3, 1), "fps", flush=True)
print(json.dumps(res, indent=1))
