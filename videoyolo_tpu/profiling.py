"""Shared measurement primitives for the benchmark and the profiling tools.

Everything here encodes the forced-timing discipline from ROADMAP
"Measurement discipline": over the axon tunnel `block_until_ready` can
return before results land, so the only true barrier is a data round-trip
(`jax.device_get` of a small dependent slice), and per-dispatch round trips
swamp single-step latencies, so step latency is measured by chaining
DEPENDENT steps inside one dispatch (`lax.scan` with a data-dependent
carry) and dividing out the chain length.

`build_latency_chain` + `chain_ms` are the single implementation of the
tunnel-proof latency method used by both bench.py and tools/prof_latency.py
(they previously carried verbatim copies that could drift apart).
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def force(out) -> None:
    """True execution barrier over the tunnel: round-trip one element."""
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def build_latency_chain(model, variables, iters: int = 20):
    """Jittable fn running `iters` DEPENDENT full detect steps (forward +
    decode + NMS) in ONE dispatch: each step's scores feed a zero-valued but
    data-dependent term into the next input, so XLA cannot parallelise the
    steps and the tunnel round-trip amortises to RTT/iters.  Call the result
    on a (B,H,W,3) image batch; time it with `chain_ms`."""
    from .models.yolo3 import postprocess

    def body(im, _):
        _ids, sc, _bb = postprocess(*model.apply(variables, im, train=False))
        return im + (sc.sum() * 0).astype(im.dtype), ()

    return jax.jit(lambda im: jax.lax.scan(body, im, None, length=iters)[0])


def chain_ms(chain_fn, x, iters: int = 20, nruns: int = 5) -> float:
    """Median per-step ms of a compiled latency chain (see
    build_latency_chain).  Warms twice (compile + steady state), then
    medians `nruns` forced timings of the whole chain / iters."""
    for _ in range(2):
        force(chain_fn(x))
    t = []
    for _ in range(nruns):
        t0 = time.perf_counter()
        force(chain_fn(x))
        t.append(time.perf_counter() - t0)
    return float(np.median(t)) * 1e3 / iters


def device_chain_ms(model, variables, x, iters: int = 20) -> float:
    """Tunnel-proof device-side B=|x| detect-step latency in ms — the
    per-request number a directly-attached deployment sees."""
    return chain_ms(build_latency_chain(model, variables, iters), x, iters)
