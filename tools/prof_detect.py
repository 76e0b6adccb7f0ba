"""Attribute detect-path time on the real chip: backbone+head fwd, decode,
top-k candidate select, NMS — each stage timed separately at B=128/416.

--s2d builds the model with the bit-equivalent space-to-depth stem
(models/s2d.py) so the stem experiment is reproducible for bf16 detect
(it already ships for train and composes with int8).

Timing forces execution with a device_get data round-trip (the tunnel's
block_until_ready can return early — see ROADMAP "Timing discipline").
"""
import os, sys, time, json, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import (
    YOLOv3, postprocess, postprocess_levels, select_topk_candidates,
)
from videoyolo_tpu.ops.nms import box_nms

ap = argparse.ArgumentParser()
ap.add_argument("--s2d", action="store_true", help="space-to-depth stem")
ap.add_argument(
    "--pad_stem", action="store_true",
    help="input-channel-padded stem (the shipped bench headline config)",
)
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--size", type=int, default=416)
ap.add_argument(
    "--no_levels", action="store_true",
    help="skip the postprocess vs postprocess_levels full-step A/B "
    "(saves one large compile)",
)
args = ap.parse_args()

B, S = args.batch, args.size
model = YOLOv3(
    num_classes=20, dtype=jnp.bfloat16, s2d_stem=args.s2d, pad_stem=args.pad_stem
)
x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False)

fwd = jax.jit(lambda im: model.apply(variables, im, train=False))
topk = jax.jit(select_topk_candidates)
nms = jax.jit(lambda c: box_nms(c, topk=-1))
full = jax.jit(lambda im: postprocess(*model.apply(variables, im, train=False)))
# A/B: the per-level fast path — same params, the model only changes its
# eval-time output formatting (per-level pairs instead of the concatenated
# (B, sum Ni, *) tensors), so `variables` is shared verbatim
import dataclasses
model_levels = dataclasses.replace(model, return_levels=True)
full_levels = jax.jit(
    lambda im: postprocess_levels(model_levels.apply(variables, im, train=False))
)

def _force(o):
    jax.device_get(jax.tree.leaves(o)[0])

def timeit(f, *args, iters=20):
    _force(f(*args))
    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _force(o)
    return (time.perf_counter() - t0) / iters * 1e3

boxes, scores = fwd(x)
# realistic score distribution for NMS timing
rs = np.random.RandomState(0)
boxes_r = jnp.asarray(rs.uniform(0, S, (B, boxes.shape[1], 4)).astype(np.float32))
scores_r = jnp.asarray((rs.uniform(0, 1, (B, scores.shape[1], 20)) ** 8).astype(np.float32))
cands = topk(boxes_r, scores_r)

res = {
    "s2d": args.s2d,
    "fwd_ms": timeit(fwd, x),
    "topk_ms": timeit(topk, boxes_r, scores_r),
    "nms_ms": timeit(nms, cands),
    "full_ms": timeit(full, x),
}
res["fps_full"] = B / res["full_ms"] * 1e3
res["fps_fwd_only"] = B / res["fwd_ms"] * 1e3
if not args.no_levels:
    res["full_levels_ms"] = timeit(full_levels, x)
    res["fps_full_levels"] = B / res["full_levels_ms"] * 1e3
print(json.dumps(res, indent=1))
