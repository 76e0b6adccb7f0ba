"""int8 static detect with vs without the space-to-depth stem, B=128/416."""
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


def build(s2d):
    model = YOLOv3(num_classes=C, dtype=jnp.bfloat16, s2d_stem=s2d)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False
    )
    qvars = quantize_detector_variables(variables)
    qvars = calibrate_detector_variables(
        dataclasses.replace(model, quant=True), qvars, [x[:8].astype(jnp.float32) + 0.5]
    )
    qmodel = dataclasses.replace(model, quant="static")
    return jax.jit(lambda im: postprocess(*qmodel.apply(qvars, im, train=False)))


def timeit(f, *args, iters=20):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3

res = {}
for name, s2d in [("int8_static", False), ("int8_static_s2d", True)]:
    res[name + "_ms"] = timeit(build(s2d), x)
    res[name + "_fps"] = round(B / res[name + "_ms"] * 1e3, 1)
    print(name, res[name + "_fps"], "fps", flush=True)
print(json.dumps(res))
