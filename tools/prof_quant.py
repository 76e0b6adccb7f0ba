"""Full-model int8 vs bf16 detect throughput at B=128/416 on the real chip."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.ops.quantize import quantize_detector_variables

B, S, C = 128, 416, 20
rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(B, S, S, 3), jnp.bfloat16)

model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
qmodel = YOLOv3(num_classes=C, quant=True, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False)
qvars = quantize_detector_variables(variables)


def timeit(f, *args, iters=20):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


full_bf16 = jax.jit(lambda im: postprocess(*model.apply(variables, im, train=False)))
full_int8 = jax.jit(lambda im: postprocess(*qmodel.apply(qvars, im, train=False)))

res = {}
res["bf16_ms"] = timeit(full_bf16, x)
res["int8_ms"] = timeit(full_int8, x)
res["bf16_fps"] = round(B / res["bf16_ms"] * 1e3, 1)
res["int8_fps"] = round(B / res["int8_ms"] * 1e3, 1)
res["speedup"] = round(res["bf16_ms"] / res["int8_ms"], 3)
print(json.dumps(res, indent=1))
