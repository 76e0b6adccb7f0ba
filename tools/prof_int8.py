"""Is int8 conv profitable on this chip?  bf16 vs int8(+int32 accum) conv.

Timing discipline for the axon remote runtime: repeated dispatch of the
same (executable, inputs) pair under-reports (round-1 lesson, bench.py
docstring) — every iteration here gets a DISTINCT pre-staged input and the
loop is forced with device_get on a small reduction of every output.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, H, W, CIN, COUT = 32, 52, 52, 256, 512
ITERS = 12
rs = np.random.RandomState(0)
w_bf = jnp.asarray(rs.rand(3, 3, CIN, COUT), jnp.bfloat16)
w_i8 = jnp.asarray(rs.randint(-127, 127, (3, 3, CIN, COUT)), jnp.int8)
# derive per-iteration variants ON DEVICE (host->tunnel transfers are slow)
base_bf = jnp.asarray(rs.rand(B, H, W, CIN), jnp.bfloat16)
base_i8 = jnp.asarray(rs.randint(-100, 100, (B, H, W, CIN)), jnp.int8)
vary_bf = jax.jit(lambda x, i: x + jnp.bfloat16(i) * jnp.bfloat16(1e-3))
vary_i8 = jax.jit(lambda x, i: x + jnp.int8(i))
xs_bf = [vary_bf(base_bf, i) for i in range(ITERS)]
xs_i8 = [vary_i8(base_i8, i) for i in range(ITERS)]
jax.block_until_ready((xs_bf, xs_i8))

dn = jax.lax.conv_dimension_numbers(
    (B, H, W, CIN), (3, 3, CIN, COUT), ("NHWC", "HWIO", "NHWC")
)
FLOPS = 2 * B * H * W * 9 * (CIN * COUT + 9 * COUT * COUT)  # 1 + (DEPTH-1) convs


DEPTH = 10
dn2 = jax.lax.conv_dimension_numbers(
    (B, H, W, COUT), (3, 3, COUT, COUT), ("NHWC", "HWIO", "NHWC")
)
w2_bf = jnp.asarray(rs.rand(3, 3, COUT, COUT) * 0.01, jnp.bfloat16)
w2_i8 = jnp.asarray(rs.randint(-127, 127, (3, 3, COUT, COUT)), jnp.int8)


@jax.jit
def conv_bf16(x, w):
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    for _ in range(DEPTH - 1):
        y = jax.lax.conv_general_dilated(
            y, w2_bf, (1, 1), "SAME", dimension_numbers=dn2
        )
        y = jnp.where(y > 0, y, jnp.bfloat16(0.1) * y)
    return jnp.sum(y, dtype=jnp.float32)


@jax.jit
def conv_int8(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    for _ in range(DEPTH - 1):
        # requant int32 -> int8 (scale, clip) then next int8 conv
        q = jnp.clip(y // 512, -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            q, w2_i8, (1, 1), "SAME", dimension_numbers=dn2,
            preferred_element_type=jnp.int32,
        )
    return jnp.sum(y.astype(jnp.float32))


def timeit(f, xs, w):
    jax.device_get(f(xs[0], w))
    t0 = time.perf_counter()
    acc = [f(x, w) for x in xs]
    jax.device_get(acc)
    return (time.perf_counter() - t0) / len(xs) * 1e3

res = {"bf16_ms": timeit(conv_bf16, xs_bf, w_bf), "int8_ms": timeit(conv_int8, xs_i8, w_i8)}
res["bf16_tflops"] = FLOPS / res["bf16_ms"] / 1e9
res["int8_tops"] = FLOPS / res["int8_ms"] / 1e9
res["speedup"] = res["bf16_ms"] / res["int8_ms"]
print(json.dumps(res, indent=1))
