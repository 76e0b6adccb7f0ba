"""Capture a device trace of the int8 and bf16 detect steps (if the axon
platform supports profiling) and report per-op HLO cost analysis."""
import os, sys, time, json, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

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
    dataclasses.replace(model, quant=True), qvars, [x[:8].astype(jnp.float32) + 0.5]
)
qmodel = dataclasses.replace(model, quant="static")
step = jax.jit(lambda im: postprocess(*qmodel.apply(qvars, im, train=False)))

lowered = step.lower(x)
compiled = lowered.compile()
try:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(json.dumps({k: v for k, v in sorted(ca.items()) if "flops" in k or "bytes" in k}, indent=1))
except Exception as e:
    print("cost_analysis failed:", e)

# try a profiler trace
out = "/tmp/vy_trace"
try:
    jax.block_until_ready(step(x))
    with jax.profiler.trace(out):
        for _ in range(3):
            o = step(x)
        jax.block_until_ready(o)
    import glob
    files = glob.glob(out + "/**/*", recursive=True)
    print("trace files:", [f for f in files if os.path.isfile(f)][:10])
except Exception as e:
    print("trace failed:", type(e).__name__, e)
