"""Attribute the int8 full-model shortfall: static activation scales
(no per-layer max pass) vs dynamic, backbone-only vs full."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models import layers as L
from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.ops.quantize import quantize_detector_variables

B, S, C = 128, 416, 20
rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(B, S, S, 3), jnp.bfloat16)

model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False)
qvars = quantize_detector_variables(variables)


def timeit(f, *args, iters=20):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


# monkey-patch a static-scale quant call (scale 1/64 everywhere; numerics
# garbage, timing realistic)
orig = L.ConvBNLeaky._quant_call

def static_quant_call(self, x, pad):
    cin = x.shape[-1]
    shape = (self.kernel, self.kernel, cin, self.features)
    qkernel = self.param("qkernel", nn.initializers.zeros, shape, jnp.int8)
    wscale = self.param("wscale", nn.initializers.ones, (self.features,), jnp.float32)
    bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * 64.0), -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(q.shape, shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        q, qkernel, (self.stride, self.stride), pad,
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * (wscale / 64.0) + bias
    out = L.leaky(yf)
    return out.astype(self.dtype) if self.dtype is not None else out

res = {}
qmodel = YOLOv3(num_classes=C, quant=True, dtype=jnp.bfloat16)
full_dyn = jax.jit(lambda im: postprocess(*qmodel.apply(qvars, im, train=False)))
res["int8_dynamic_ms"] = timeit(full_dyn, x)

L.ConvBNLeaky._quant_call = static_quant_call
qmodel2 = YOLOv3(num_classes=C, quant=True, dtype=jnp.bfloat16)
full_static = jax.jit(lambda im: postprocess(*qmodel2.apply(qvars, im, train=False)))
res["int8_static_ms"] = timeit(full_static, x)
L.ConvBNLeaky._quant_call = orig

for k in list(res):
    res[k.replace("_ms", "_fps")] = round(B / res[k] * 1e3, 1)
print(json.dumps(res, indent=1))
