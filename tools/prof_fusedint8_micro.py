"""Microbench: does producer-side requantisation let XLA keep int8 between
conv cells (vs the current consumer-side quantize with f32 crossing)?

Chain of K 3x3 int8 convs at a darknet-ish shape.  Style A is the shipped
static path (cell writes f32, next cell quantizes).  Style B moves the
requant into the producer epilogue so only int8 crosses cells.  If XLA
fuses the epilogue, B's HBM traffic per inter-cell tensor drops 10B -> 2B
per element and the chain should approach compute-bound.
"""
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

B, H, W, CIN = 32, 104, 104, 256
K = 8

rs = np.random.RandomState(0)
ws = [jnp.asarray(rs.randint(-127, 128, (3, 3, CIN, CIN)), jnp.int8) for _ in range(K)]
wscales = [jnp.asarray(rs.rand(CIN) * 1e-3 + 1e-4, jnp.float32) for _ in range(K)]
biases = [jnp.asarray(rs.rand(CIN) - 0.5, jnp.float32) for _ in range(K)]
xscales = [jnp.float32(0.05) for _ in range(K + 1)]
x0 = jnp.asarray(rs.rand(B, H, W, CIN) * 6 - 3, jnp.float32)

DN = None


def conv_i8(q, w):
    global DN
    if DN is None:
        DN = jax.lax.conv_dimension_numbers(q.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        q, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN,
        preferred_element_type=jnp.int32,
    )


def leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


@jax.jit
def chain_consumer_quant(x):
    """Style A (shipped): f32 crosses cells; each cell quantizes its input."""
    for i in range(K):
        q = jnp.clip(jnp.round(x / xscales[i]), -127, 127).astype(jnp.int8)
        y = conv_i8(q, ws[i])
        x = leaky(y.astype(jnp.float32) * (xscales[i] * wscales[i]) + biases[i])
    return x


@jax.jit
def chain_producer_requant(x):
    """Style B (fused): int8 crosses cells; requant in the producer epilogue."""
    q = jnp.clip(jnp.round(x / xscales[0]), -127, 127).astype(jnp.int8)
    for i in range(K):
        y = conv_i8(q, ws[i])
        f = leaky(y.astype(jnp.float32) * (xscales[i] * wscales[i]) + biases[i])
        q = jnp.clip(jnp.round(f / xscales[i + 1]), -127, 127).astype(jnp.int8)
    return q


@jax.jit
def chain_bf16(x):
    """bf16 reference chain (dequantised weights)."""
    h = x.astype(jnp.bfloat16)
    for i in range(K):
        w = (ws[i].astype(jnp.float32) * wscales[i]).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN,
            preferred_element_type=jnp.float32,
        )
        h = leaky(y + biases[i]).astype(jnp.bfloat16)
    return h


def timeit(f, x, iters=30):
    jax.block_until_ready(f(x))
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


res = {}
res["consumer_quant_ms"] = round(timeit(chain_consumer_quant, x0), 3)
res["producer_requant_ms"] = round(timeit(chain_producer_requant, x0), 3)
res["bf16_ms"] = round(timeit(chain_bf16, x0), 3)
flops = 2 * B * H * W * CIN * CIN * 9 * K
res["producer_tops"] = round(flops / (res["producer_requant_ms"] * 1e-3) / 1e12, 1)
res["speedup_vs_consumer"] = round(res["consumer_quant_ms"] / res["producer_requant_ms"], 3)
print(json.dumps(res, indent=1))
