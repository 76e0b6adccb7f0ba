"""Serving latency profiler: single-request step latency on the real chip.

Throughput benches (bench.py) pipeline ITERS dispatches and amortise; a
serving deployment cares about per-request latency at small batch.  This
times one fully-forced step at a time (p50/p90 over N requests) for bf16
and static-int8 YOLOv3 at B in {1, 8}.

Tunnel correction: every forced step pays the axon tunnel's round-trip on
top of device time, so we also measure the RTT of a trivial dependent op
and report both raw and RTT-corrected latency.  On a directly-attached
TPU-VM the raw number is the real one.

Usage: python tools/prof_latency.py [--size 416] [--n 50]
"""
import argparse
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
from videoyolo_tpu.profiling import device_chain_ms, force as _force


def percentiles(samples_ms):
    a = np.sort(np.asarray(samples_ms))
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 2),
        "p90_ms": round(float(np.percentile(a, 90)), 2),
        "p99_ms": round(float(np.percentile(a, 99)), 2),
    }


def measure_rtt(n=50):
    y = jax.device_put(jnp.zeros((8,), jnp.float32))
    f = jax.jit(lambda v: v + 1.0)
    _force(f(y))
    t = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(f(y))
        t.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(t, 50))


def latency(step, x, n):
    _force(step(x))
    _force(step(x))
    t = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(step(x))
        t.append((time.perf_counter() - t0) * 1e3)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--classes", type=int, default=20)
    args = ap.parse_args()

    rtt = measure_rtt()
    print(f"tunnel rtt p50: {rtt:.2f} ms", flush=True)

    model = YOLOv3(num_classes=args.classes, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.size, args.size, 3), jnp.bfloat16),
        train=False,
    )
    calib = np.random.RandomState(0).rand(8, args.size, args.size, 3).astype(np.float32)
    qmodel, qvars = quantize_fused(model, variables, [calib])

    results = {"rtt_p50_ms": round(rtt, 2)}
    for b in (1, 8):
        x = jnp.asarray(
            np.random.RandomState(1).rand(b, args.size, args.size, 3), jnp.bfloat16
        )
        for tag, m, v in (("bf16", model, variables), ("int8", qmodel, qvars)):
            # close over weights: params-as-jit-arguments cost ~4 s/call
            # over the tunnel (ROADMAP "Measurement discipline" #2)
            v = jax.device_put(v)
            step = jax.jit(lambda im, m=m, vv=v: postprocess(*m.apply(vv, im, train=False)))
            t = latency(step, x, args.n)
            p = percentiles(t)
            p["p50_corrected_ms"] = round(max(p["p50_ms"] - rtt, 0.0), 2)
            p["device_chain_ms"] = round(device_chain_ms(m, v, x), 2)
            results[f"b{b}_{tag}"] = p
            print(f"B={b} {tag}: {p}", flush=True)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
