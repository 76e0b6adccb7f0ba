"""A/B the NMS greedy-scan recurrence vs an exact Jacobi fixed-point solve.

The shipped ops/nms.py runs the inherently sequential suppression as a
`lax.fori_loop` over K=400 steps (~2.7-3.5 ms standalone at B=128 — the
per-iteration loop overhead, not the math).  The recurrence

    keep_j = valid_j  AND  NOT exists i<j : keep_i AND suppress[i,j]

has a UNIQUE fixed point (strong induction over j: each keep_j is
determined by lower-indexed entries), and Jacobi iteration from
keep^0 = valid reaches it in at most D steps, where D is the longest
suppression chain (depth induction: after m iterations every index whose
chain depth is <= m holds its final value; all predecessors of a
depth-(m+1) node have depth <= m).  Real detections have D << K, so a
`lax.while_loop` that stops when the vector stabilises — any fixed point
of the map IS the unique solution, so early stopping is exact — replaces
400 dependent micro-steps with ~D batched (K,K) matvecs on the MXU.

The >0 test on the float matvec is exact in any dtype: all terms are
non-negative, so the sum is positive iff any term is (no cancellation).

Probe: exactness vs the shipped scan on adversarial random candidates +
forced timing of both at B=128/K=400, plus the full detect step A/B.
"""
import os, sys, time, json, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.ops.nms import box_nms, _iou_matrix  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--k", type=int, default=400)
ap.add_argument("--post_nms", type=int, default=100)
args = ap.parse_args()
B, K, M = args.batch, args.k, args.post_nms


def _nms_single_fp(dets, overlap_thresh=0.45, valid_thresh=0.01, post_nms=100,
                   force_suppress=False):
    """ops/nms._nms_single with presorted=True semantics, fixed-point keep."""
    k = dets.shape[0]
    ids = dets[:, 0]
    scores = dets[:, 1]
    valid = (scores > valid_thresh) & (ids >= 0)
    iou = _iou_matrix(dets[:, 2:6])
    if force_suppress:
        same_class = jnp.ones((k, k), dtype=bool)
    else:
        same_class = ids[:, None] == ids[None, :]
    col = jnp.arange(k)
    suppress = (
        (iou > overlap_thresh) & same_class & (col[None, :] > col[:, None])
    ).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(state):
        keep, _prev, it = state
        hit = jnp.einsum("i,ij->j", keep.astype(jnp.float32), suppress) > 0
        return valid & ~hit, keep, it + 1

    keep, _, iters = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0))
    )
    packed_order = jnp.argsort(~keep, stable=True)
    m = min(post_nms, k) if post_nms > 0 else k
    out_idx = packed_order[:m]
    out = jnp.where(
        keep[out_idx, None], dets[out_idx], jnp.full((m, 6), -1.0, dets.dtype)
    )
    return out, iters


def nms_fp(dets):
    out, iters = jax.vmap(_nms_single_fp)(dets)
    return out, iters


# adversarial candidates: clustered boxes (deep suppression chains), 20
# classes, sorted descending scores, some below valid_thresh, some -1 rows
rs = np.random.RandomState(0)
centers = rs.uniform(0, 416, (B, 40, 2))
pick = rs.randint(0, 40, (B, K))
cxy = np.take_along_axis(centers, pick[..., None], axis=1) + rs.normal(
    0, 12, (B, K, 2)
)
wh = rs.uniform(20, 120, (B, K, 2))
boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
scores = np.sort(rs.uniform(0, 1, (B, K)).astype(np.float32), axis=1)[:, ::-1]
scores[:, -40:] = rs.uniform(0, 0.009, (B, 40))  # below valid_thresh tail
ids = rs.randint(0, 20, (B, K)).astype(np.float32)
ids[:, -8:] = -1.0
dets = jnp.asarray(
    np.concatenate(
        [ids[..., None], scores[..., None], boxes], axis=-1
    ).astype(np.float32)
)

scan = jax.jit(lambda d: box_nms(d, topk=-1, presorted=True, post_nms=M))
fp = jax.jit(nms_fp)

ref = np.asarray(scan(dets))
got, iters = map(np.asarray, fp(dets))
exact = bool((ref == got).all())


def _force(o):
    jax.device_get(jax.tree.leaves(o)[0])


def timeit(f, *a, iters=30):
    _force(f(*a))
    _force(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    _force(o)
    return (time.perf_counter() - t0) / iters * 1e3


res = {
    "exact_equal": exact,
    "fp_iters_max": int(iters.max()),
    "fp_iters_mean": round(float(iters.mean()), 2),
    "scan_ms": timeit(scan, dets),
    "fp_ms": timeit(fp, dets),
}
print(json.dumps(res, indent=1))
