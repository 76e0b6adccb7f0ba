"""Real-chip smoke for the kept Pallas kernels — one command per round.

The three Pallas kernels in the tree ship as *measured negative/parity
results* (PARITY.md "North-star Pallas clauses"): the XLA emission won on
this toolchain, and the kernels are kept runnable as the record.  Their
pytest coverage runs interpret-mode only (fine on a CPU CI host), so if
Mosaic/toolchain drift broke the compiled kernels the recorded numbers
would silently become unreproducible.  This script re-validates all three
COMPILED on the TPU each round — correctness against the shipped XLA path
plus forced timing — and the pass + ratios are recorded in ROADMAP.md.

  nms   ops/pallas_nms.nms_scan_pallas vs the vmapped XLA scan
        (ops/nms._nms_single): exact keep-mask equality on presorted
        candidates at the production shape (B=128, K=400)
  ds    ops/pallas_conv.pallas_quant_downsample vs the bit-equivalent
        xla_s2d_downsample (same packed-tap math through XLA's dense conv):
        exact int8 equality at a mid darknet stage (104px, 128->256)
  corr  ops/pallas_correlation.correlation_pallas vs ops/correlation
        (k=1/stride1=1 cost volume): allclose at flownet-like shape

Timing per ROADMAP "Measurement discipline": device_get data round-trip
forces; distinct staged inputs are unnecessary here because we report a
ratio of two identically-dispatched paths, not an absolute rate.

Usage: python tools/prof_pallas.py [--iters 20]
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


from videoyolo_tpu.profiling import force as _force  # noqa: E402 — the one
# shared tunnel-barrier primitive; never re-roll it (the copies drift)


def timeit_ms(f, *args, iters=20):
    _force(f(*args))
    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _force(o)
    return (time.perf_counter() - t0) / iters * 1e3


def smoke_nms(iters):
    from videoyolo_tpu.ops.nms import _nms_single
    from videoyolo_tpu.ops.pallas_nms import nms_scan_pallas

    b, k = 128, 400
    rs = np.random.RandomState(0)
    scores = np.sort(rs.rand(b, k))[:, ::-1].astype(np.float32)
    ids = rs.randint(0, 20, (b, k)).astype(np.float32)
    xy = rs.rand(b, k, 2).astype(np.float32) * 300
    wh = rs.rand(b, k, 2).astype(np.float32) * 100 + 5
    dets = jnp.asarray(
        np.concatenate([ids[..., None], scores[..., None], xy, xy + wh], -1)
    )

    pallas = jax.jit(lambda d: nms_scan_pallas(d))  # compiled, NOT interpret
    xla = jax.jit(
        jax.vmap(lambda d: _nms_single(d, 0.45, 0.01, -1, -1, False))
    )
    keep_p = np.asarray(pallas(dets))
    out_x = np.asarray(xla(dets))
    # the XLA path returns suppressed rows as -1; equality surface = kept rows
    for i in range(b):
        kept = np.asarray(dets)[i][keep_p[i] > 0]
        ref = out_x[i][out_x[i][:, 0] >= 0]
        assert len(kept) == len(ref), (i, len(kept), len(ref))
        np.testing.assert_allclose(kept, ref, rtol=1e-6)
    p_ms, x_ms = timeit_ms(pallas, dets, iters=iters), timeit_ms(xla, dets, iters=iters)
    return {"pallas_ms": round(p_ms, 3), "xla_ms": round(x_ms, 3),
            "pallas_over_xla": round(p_ms / x_ms, 2), "equal": True}


def smoke_ds(iters):
    from videoyolo_tpu.ops.pallas_conv import (
        pallas_quant_downsample,
        xla_s2d_downsample,
    )

    b, h, cin, cout = 8, 104, 128, 256
    rs = np.random.RandomState(1)
    q_in = jnp.asarray(rs.randint(-127, 128, (b, h, h, cin)), jnp.int8)
    qk = jnp.asarray(rs.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)
    scale = jnp.asarray(rs.rand(cout).astype(np.float32) * 1e-3)
    bias = jnp.asarray(rs.randn(cout).astype(np.float32) * 1e-2)
    oscale = jnp.float32(0.05)

    pallas = jax.jit(
        lambda x: pallas_quant_downsample(x, qk, scale, bias, oscale)
    )
    xla = jax.jit(lambda x: xla_s2d_downsample(x, qk, scale, bias, oscale))
    got, want = np.asarray(pallas(q_in)), np.asarray(xla(q_in))
    # same packed-tap int32 contraction + identical epilogue -> bit equal
    # modulo round-to-nearest ties at the int8 boundary
    mismatch = int((got != want).sum())
    assert mismatch <= got.size * 1e-4, f"{mismatch}/{got.size} int8 mismatches"
    p_ms, x_ms = timeit_ms(pallas, q_in, iters=iters), timeit_ms(xla, q_in, iters=iters)
    return {"pallas_ms": round(p_ms, 3), "xla_ms": round(x_ms, 3),
            "pallas_over_xla": round(p_ms / x_ms, 2),
            "int8_mismatch_frac": mismatch / got.size}


def smoke_corr(iters):
    from videoyolo_tpu.ops.correlation import correlation
    from videoyolo_tpu.ops.pallas_correlation import correlation_pallas

    b, h, w, c, d = 4, 52, 52, 64, 4
    rs = np.random.RandomState(2)
    f1 = jnp.asarray(rs.rand(b, h, w, c), jnp.float32)
    f2 = jnp.asarray(rs.rand(b, h, w, c), jnp.float32)

    pallas = jax.jit(lambda a, bb: correlation_pallas(a, bb, d, stride2=1))
    xla = jax.jit(lambda a, bb: correlation(a, bb, d, stride2=1))
    np.testing.assert_allclose(
        np.asarray(pallas(f1, f2)), np.asarray(xla(f1, f2)), rtol=1e-5, atol=1e-5
    )
    p_ms = timeit_ms(pallas, f1, f2, iters=iters)
    x_ms = timeit_ms(xla, f1, f2, iters=iters)
    return {"pallas_ms": round(p_ms, 3), "xla_ms": round(x_ms, 3),
            "pallas_over_xla": round(p_ms / x_ms, 2), "allclose": True}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default="", help="comma list: nms,ds,corr")
    args = ap.parse_args()
    only = {s for s in args.only.split(",") if s}
    res = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}
    for name, fn in (("nms", smoke_nms), ("ds", smoke_ds), ("corr", smoke_corr)):
        if only and name not in only:
            continue
        res[name] = fn(args.iters)
        print(json.dumps({name: res[name]}), flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
