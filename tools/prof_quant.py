"""int8 serving profiler — one parameterised tool for the quant measurements
recorded in ROADMAP.md (consolidates the former prof_quant{,2,3,4}.py scratch
scripts).

Modes (B=128, 416px, 20 classes, full detect incl. postprocess, v5e chip):
  full     int8 (BN-folded per-channel weights, dynamic act scales) vs bf16
  attrib   dynamic vs static activation scales (static here uses a fixed
           1/64 scale monkey-patch: numerics garbage, timing realistic)
  s2d      static-int8 with vs without the space-to-depth stem
  ceiling  static-int8 with residual adds removed (numerically wrong —
           probes how much the residual-path materialisation costs)
  fused    producer-side-requant fused int8 pipeline (quant="fused") vs
           static — the round-3 int8-end-to-end path

Usage: python tools/prof_quant.py [--mode full] [--batch 128] [--iters 20]
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
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models import darknet as D
from videoyolo_tpu.models import layers as L
from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.ops.quantize import (
    calibrate_detector_variables,
    quantize_detector_variables,
)

S, C = 416, 20


def timeit(f, x, iters, batch):
    """Forced timing per ROADMAP measurement discipline: warm once, time a
    loop, force the last output through device_get."""
    # warmups force with a data round-trip too: over the axon tunnel,
    # block_until_ready can return early and leak warmup work into the
    # timed region (see tools/prof_temporal._force)
    jax.device_get(jax.tree_util.tree_leaves(f(x))[0])
    jax.device_get(jax.tree_util.tree_leaves(f(x))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, round(batch / ms * 1e3, 1)


def build_f32(s2d=False):
    model = YOLOv3(num_classes=C, dtype=jnp.bfloat16, s2d_stem=s2d)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False
    )
    return model, variables


def jit_detect(model, variables):
    return jax.jit(lambda im: postprocess(*model.apply(variables, im, train=False)))


def build_static(x, s2d=False, quant="static"):
    model, variables = build_f32(s2d)
    qvars = quantize_detector_variables(variables)
    qvars = calibrate_detector_variables(
        dataclasses.replace(model, quant=True), qvars, [x[:8].astype(jnp.float32)]
    )
    return jit_detect(dataclasses.replace(model, quant=quant), qvars)


def mode_full(x, iters, batch):
    model, variables = build_f32()
    qvars = quantize_detector_variables(variables)
    qmodel = dataclasses.replace(model, quant=True)
    res = {}
    res["bf16_ms"], res["bf16_fps"] = timeit(jit_detect(model, variables), x, iters, batch)
    res["int8_ms"], res["int8_fps"] = timeit(jit_detect(qmodel, qvars), x, iters, batch)
    res["speedup"] = round(res["bf16_ms"] / res["int8_ms"], 3)
    return res


def mode_attrib(x, iters, batch):
    model, variables = build_f32()
    qvars = quantize_detector_variables(variables)
    res = {}
    qmodel = dataclasses.replace(model, quant=True)
    res["int8_dynamic_ms"], res["int8_dynamic_fps"] = timeit(
        jit_detect(qmodel, qvars), x, iters, batch
    )

    # fixed-scale static quant monkey-patch: no per-layer max pass
    orig = L.ConvBNLeaky._quant_call

    def static_quant_call(self, xx, pad):
        cin = xx.shape[-1]
        shape = (self.kernel, self.kernel, cin, self.features)
        qkernel = self.param("qkernel", nn.initializers.zeros, shape, jnp.int8)
        wscale = self.param("wscale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        q = jnp.clip(jnp.round(xx.astype(jnp.float32) * 64.0), -127, 127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(q.shape, shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            q, qkernel, (self.stride, self.stride), pad,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        yf = y.astype(jnp.float32) * (wscale / 64.0) + bias
        out = L.leaky(yf)
        return out.astype(self.dtype) if self.dtype is not None else out

    L.ConvBNLeaky._quant_call = static_quant_call
    try:
        qmodel2 = dataclasses.replace(model, quant=True)
        res["int8_static_ms"], res["int8_static_fps"] = timeit(
            jit_detect(qmodel2, qvars), x, iters, batch
        )
    finally:
        L.ConvBNLeaky._quant_call = orig
    return res


def mode_s2d(x, iters, batch):
    res = {}
    for name, s2d in [("int8_static", False), ("int8_static_s2d", True)]:
        res[name + "_ms"], res[name + "_fps"] = timeit(
            build_static(x, s2d=s2d), x, iters, batch
        )
    return res


def mode_ceiling(x, iters, batch):
    res = {}
    res["int8_static_ms"], res["int8_static_fps"] = timeit(
        build_static(x), x, iters, batch
    )

    orig = D.DarknetBasicBlock.__call__

    def no_residual(self, xx, train=False):
        y = L.ConvBNLeaky(self.channels, kernel=1, stride=1, quant=self.quant, dtype=self.dtype)(xx, train)
        return L.ConvBNLeaky(self.channels * 2, kernel=3, stride=1, quant=self.quant, dtype=self.dtype)(y, train)

    D.DarknetBasicBlock.__call__ = nn.compact(no_residual)
    try:
        res["int8_noresidual_ms"], res["int8_noresidual_fps"] = timeit(
            build_static(x), x, iters, batch
        )
    finally:
        D.DarknetBasicBlock.__call__ = orig
    return res


def mode_fused(x, iters, batch):
    from videoyolo_tpu.ops.quantize import quantize_fused

    res = {}
    res["int8_static_ms"], res["int8_static_fps"] = timeit(
        build_static(x), x, iters, batch
    )
    model, variables = build_f32()
    qmodel, qvars = quantize_fused(model, variables, [x[:8].astype(jnp.float32)])
    res["int8_fused_ms"], res["int8_fused_fps"] = timeit(
        jit_detect(qmodel, qvars), x, iters, batch
    )
    res["speedup"] = round(res["int8_static_ms"] / res["int8_fused_ms"], 3)
    return res


MODES = {
    "full": mode_full,
    "attrib": mode_attrib,
    "s2d": mode_s2d,
    "ceiling": mode_ceiling,
    "fused": mode_fused,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="full", choices=sorted(MODES))
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(args.batch, S, S, 3), jnp.bfloat16)
    res = MODES[args.mode](x, args.iters, args.batch)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
