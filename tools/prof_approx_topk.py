"""A/B the detect tail's candidate top-k: exact two-stage `lax.top_k`
(the shipped select_topk_candidates) vs TPU `lax.approx_max_k`
(PartialReduce) in one or both stages.

Motivation: the r5 per-stage attribution (ROADMAP "detect per-stage
attribution") puts top-k select at ~5.9 ms of the 65 ms B=128/416 step —
the largest non-conv slice.  `approx_max_k` is the TPU-native fast path
for exactly this shape (wide scan, k << width); with
aggregate_to_topk=True its output is still sorted descending, so the
NMS presorted invariant holds.  The trade is bounded recall (< 1.0) on
the *candidate pool* — candidates lost are the lowest-scored of the 400,
which post_nms=100 rarely keeps anyway.

Times each selector standalone on a realistic score distribution and as
a full detect step A/B.  Forced timing via device_get round-trip.
"""
import os, sys, time, json, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess, select_topk_candidates

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--size", type=int, default=416)
ap.add_argument("--recall", type=float, default=0.95)
args = ap.parse_args()

B, S = args.batch, args.size
model = YOLOv3(num_classes=20, dtype=jnp.bfloat16, pad_stem=True)
x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
variables = model.init(
    jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False
)

fwd = jax.jit(lambda im: model.apply(variables, im, train=False))
boxes, scores = fwd(x)
rs = np.random.RandomState(0)
boxes_r = jnp.asarray(rs.uniform(0, S, (B, boxes.shape[1], 4)).astype(np.float32))
scores_r = jnp.asarray(
    (rs.uniform(0, 1, (B, scores.shape[1], 20)) ** 8).astype(np.float32)
)


def _force(o):
    jax.device_get(jax.tree.leaves(o)[0])


def timeit(f, *a, iters=20):
    _force(f(*a))
    _force(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    _force(o)
    return (time.perf_counter() - t0) / iters * 1e3


sel_exact = jax.jit(select_topk_candidates)
sel_approx = jax.jit(
    lambda b, s: select_topk_candidates(b, s, approx_recall=args.recall)
)
full_exact = jax.jit(lambda im: postprocess(*model.apply(variables, im, train=False)))
full_approx = jax.jit(
    lambda im: postprocess(
        *model.apply(variables, im, train=False), approx_recall=args.recall
    )
)

# measured candidate-pool recall of the approx selector vs exact (random
# scores are the worst case: near-uniform values near the k-th threshold)
ce = np.asarray(sel_exact(boxes_r, scores_r))
ca = np.asarray(sel_approx(boxes_r, scores_r))
rec = []
for i in range(B):
    ekeys = {tuple(r) for r in np.round(ce[i], 4)}
    akeys = {tuple(r) for r in np.round(ca[i], 4)}
    rec.append(len(ekeys & akeys) / max(1, len(ekeys)))

def sel_stage1_noagg(boxes, scores, topk=400):
    """Variant: approx stage-1 WITHOUT aggregate_to_topk (membership only —
    stage 2's exact top-k restores the exact ordering), exact stage 2."""
    b, n, c = scores.shape
    k_boxes = min(topk, n)
    box_best = jnp.max(scores, axis=-1)
    _, box_idx0 = jax.lax.approx_max_k(
        box_best, k_boxes, recall_target=args.recall, aggregate_to_topk=False
    )
    k_eff = box_idx0.shape[-1]  # approx may return more than k without agg
    cand = jnp.concatenate([scores, boxes], axis=-1)
    pool = jnp.take_along_axis(cand, box_idx0[..., None], axis=1)
    pool_scores = pool[..., :c]
    pool_boxes = pool[..., c:]
    flat = pool_scores.reshape(b, k_eff * c)
    top_scores, flat_idx = jax.lax.top_k(flat, min(topk, k_eff * c))
    box_idx = flat_idx // c
    cls_idx = (flat_idx % c).astype(boxes.dtype)
    top_boxes = jnp.take_along_axis(pool_boxes, box_idx[..., None], axis=1)
    return jnp.concatenate(
        [cls_idx[..., None], top_scores[..., None].astype(boxes.dtype), top_boxes],
        axis=-1,
    )


from videoyolo_tpu.models.yolo3 import _nms_tail  # noqa: E402

sel_s1 = jax.jit(sel_stage1_noagg)
full_s1 = jax.jit(
    lambda im: _nms_tail(
        sel_stage1_noagg(*model.apply(variables, im, train=False)), 0.45, 100, False
    )
)

cs = np.asarray(sel_s1(boxes_r, scores_r))
rec_s1 = []
for i in range(B):
    ekeys = {tuple(r) for r in np.round(ce[i], 4)}
    skeys = {tuple(r) for r in np.round(cs[i], 4)}
    rec_s1.append(len(ekeys & skeys) / max(1, len(ekeys)))

res = {
    "recall_target": args.recall,
    "topk_exact_ms": timeit(sel_exact, boxes_r, scores_r),
    "topk_approx_ms": timeit(sel_approx, boxes_r, scores_r),
    "topk_s1noagg_ms": timeit(sel_s1, boxes_r, scores_r),
    "full_exact_ms": timeit(full_exact, x),
    "full_approx_ms": timeit(full_approx, x),
    "full_s1noagg_ms": timeit(full_s1, x),
    "pool_recall_measured": round(float(np.mean(rec)), 4),
    "pool_recall_s1noagg": round(float(np.mean(rec_s1)), 4),
}
res["fps_exact"] = B / res["full_exact_ms"] * 1e3
res["fps_approx"] = B / res["full_approx_ms"] * 1e3
res["fps_s1noagg"] = B / res["full_s1noagg_ms"] * 1e3
print(json.dumps(res, indent=1))
