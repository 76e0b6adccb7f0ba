"""Ceiling probe: how much of the int8 detect time is the residual-path
bf16 materialisation?  Times the static-int8 model with residual adds
disabled (numerically wrong — timing only)."""
import os, sys, time, json, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models import darknet as D
from videoyolo_tpu.models.layers import ConvBNLeaky
from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.ops.quantize import (
    calibrate_detector_variables,
    quantize_detector_variables,
)
from flax import linen as nn

B, S, C = 128, 416, 20
rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(B, S, S, 3), jnp.bfloat16)


def timeit(f, *args, iters=20):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def build():
    model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False
    )
    qvars = quantize_detector_variables(variables)
    qvars = calibrate_detector_variables(
        dataclasses.replace(model, quant=True), qvars, [x[:8].astype(jnp.float32) + 0.5]
    )
    qmodel = dataclasses.replace(model, quant="static")
    return jax.jit(lambda im: postprocess(*qmodel.apply(qvars, im, train=False)))


res = {}
f = build()
res["int8_static_ms"] = timeit(f, x)

orig = D.DarknetBasicBlock.__call__

def no_residual(self, x, train=False):
    y = ConvBNLeaky(self.channels, kernel=1, stride=1, quant=self.quant, dtype=self.dtype)(x, train)
    return ConvBNLeaky(self.channels * 2, kernel=3, stride=1, quant=self.quant, dtype=self.dtype)(y, train)

D.DarknetBasicBlock.__call__ = nn.compact(no_residual)
f2 = build()
res["int8_noresidual_ms"] = timeit(f2, x)
D.DarknetBasicBlock.__call__ = orig
for k in list(res):
    res[k.replace("_ms", "_fps")] = round(B / res[k] * 1e3, 1)
print(json.dumps(res))
