"""Per-op device trace of the static-int8 detect step: where do the 46 ms go?

Aggregates trace events by op name and prints the top entries — convolution
kernels vs elementwise fusions (the quantize/dequantize traffic) vs top-k/NMS.
"""
import collections
import dataclasses
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.ops.quantize import (
    calibrate_detector_variables,
    quantize_detector_variables,
)

B, S, C = 128, 416, 20
rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(B, S, S, 3), jnp.bfloat16)

model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False)
qvars = quantize_detector_variables(variables)
qvars = calibrate_detector_variables(
    dataclasses.replace(model, quant=True), qvars, [x[:8].astype(jnp.float32)]
)
qmodel = dataclasses.replace(model, quant="static")
step = jax.jit(lambda im: postprocess(*qmodel.apply(qvars, im, train=False)))

jax.block_until_ready(step(x))
out = "/tmp/vy_int8_trace"
with jax.profiler.trace(out):
    for _ in range(3):
        o = step(x)
    jax.device_get(o[0])

tr_file = sorted(glob.glob(out + "/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(tr_file) as f:
    tr = json.load(f)

per_op = collections.Counter()
total = 0
for e in tr.get("traceEvents", []):
    if e.get("ph") != "X" or "dur" not in e:
        continue
    n = e["name"]
    if n.startswith("$") or "jit_" in n or "block_until" in n or "trace" in n or "__exit__" in n or "PjitFunction" in n:
        continue
    total += e["dur"]
    per_op[n] += e["dur"]

print(f"total device us over 3 iters: {total}  (~{total/3/1e3:.1f} ms/iter)")
for name, us in per_op.most_common(40):
    print(f"{us/3/1e3:9.3f} ms  {name}")
