"""Measure the Pallas int8 s2d downsample kernel (ops/pallas_conv.py).

Modes:
  micro  per-stage kernel-alone vs XLA strided int8 conv (darknet downsample
         shapes at 416px), forced timing
  e2e    full detect step: quantize_fused with ds_conv in {direct, s2d, pallas}

Usage: python tools/prof_pallas_ds.py [--mode micro] [--batch 128] [--iters 20]
"""
import argparse
import dataclasses
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

from videoyolo_tpu.ops.pallas_conv import pallas_quant_downsample

S, C = 416, 20

# darknet53 downsample cells at 416px: (input H, Cin, Cout); stage1 (416, 32,
# 64) is excluded by the layers.py gate, measured here anyway for the record
STAGES = [
    ("stage1", 416, 32, 64),
    ("stage2", 208, 64, 128),
    ("stage3", 104, 128, 256),
    ("stage4", 52, 256, 512),
    ("stage5", 26, 512, 1024),
]


def timeit(f, x, iters):
    # warmups force with a data round-trip too: over the axon tunnel,
    # block_until_ready can return early and leak warmup work into the
    # timed region (see tools/prof_temporal._force)
    jax.device_get(jax.tree_util.tree_leaves(f(x))[0])
    jax.device_get(jax.tree_util.tree_leaves(f(x))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def mode_micro(args):
    rs = np.random.RandomState(0)
    res = {}
    for name, h, cin, cout in STAGES:
        b = args.batch
        q = jnp.asarray(rs.randint(-127, 128, (b, h, h, cin)), jnp.int8)
        qk = jnp.asarray(rs.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)
        scale = jnp.asarray(rs.rand(cout) * 1e-3 + 1e-4, jnp.float32)
        bias = jnp.asarray(rs.randn(cout) * 0.1, jnp.float32)
        oscale = jnp.float32(0.05)

        dn = jax.lax.conv_dimension_numbers(
            q.shape, qk.shape, ("NHWC", "HWIO", "NHWC")
        )

        @jax.jit
        def xla(x, qk=qk, scale=scale, bias=bias, oscale=oscale, dn=dn):
            y = jax.lax.conv_general_dilated(
                x, qk, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=dn, preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32) * scale + bias
            yf = jnp.where(yf > 0, yf, 0.1 * yf)
            return jnp.clip(jnp.round(yf / oscale), -127, 127).astype(jnp.int8)

        rb = 16 if h >= 208 else 8

        def pallas(x, qk=qk, scale=scale, bias=bias, oscale=oscale, rb=rb):
            return pallas_quant_downsample(x, qk, scale, bias, oscale, row_block=rb)

        xla_ms = timeit(xla, q, args.iters)
        print(f"# {name} xla {xla_ms:.3f} ms", flush=True)
        try:
            pallas_ms = timeit(pallas, q, args.iters)
        except Exception as e:  # compile failure: record, keep going
            pallas_ms = None
            res[name + "_pallas_error"] = type(e).__name__ + ": " + str(e)[:200]
        res[name] = {
            "xla_ms": round(xla_ms, 3),
            "pallas_ms": round(pallas_ms, 3) if pallas_ms else None,
            "speedup": round(xla_ms / pallas_ms, 3) if pallas_ms else None,
            # int8 TOPS on the 3x3 MACs
            "pallas_tops": round(
                2 * args.batch * (h // 2) ** 2 * 9 * cin * cout / (pallas_ms * 1e9), 1
            ) if pallas_ms else None,
        }
        print("# " + name + " " + json.dumps(res[name]), flush=True)
    return res


def mode_e2e(args):
    from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
    from videoyolo_tpu.ops.quantize import quantize_fused

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(args.batch, S, S, 3), jnp.bfloat16)
    model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False
    )
    qmodel, qvars = quantize_fused(model, variables, [x[:8].astype(jnp.float32)])
    res = {}
    for ds in ("direct", "s2d", "pallas"):
        m = dataclasses.replace(qmodel, ds_conv=ds)
        f = jax.jit(lambda im, m=m: postprocess(*m.apply(qvars, im, train=False)))
        ms = timeit(f, x, args.iters)
        res[ds + "_ms"] = round(ms, 2)
        res[ds + "_fps"] = round(args.batch / ms * 1e3, 1)
    res["s2d_speedup"] = round(res["direct_ms"] / res["s2d_ms"], 3)
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="micro", choices=["micro", "e2e"])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    print(json.dumps({"micro": mode_micro, "e2e": mode_e2e}[args.mode](args), indent=1))


if __name__ == "__main__":
    main()
