"""Train-step recipe sweep on the real chip: batch x s2d x remat.
Forced timing via device_get on the loss each step."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import YOLOv3
from videoyolo_tpu.train.lr import lr_schedule
from videoyolo_tpu.train.step import create_train_state, make_train_step

S = 416
CONFIGS = [
    ("b48_s2d", 48, True, False),
    ("b64_s2d", 64, True, False),
    ("b64_s2d_remat", 64, True, True),
    ("b96_s2d_remat", 96, True, True),
    ("b32_s2d", 32, True, False),
]


def bench_one(batch, s2d, remat, iters=10):
    model = YOLOv3(num_classes=20, dtype=jnp.bfloat16, s2d_stem=s2d, remat=remat)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), train=False)
    lr_fn = lr_schedule("step", 1e-3, steps_per_epoch=100, epochs=10)
    state = create_train_state(model, variables, lr_fn)
    step = jax.jit(make_train_step(model, num_classes=20), donate_argnums=(0,))
    rs = np.random.RandomState(0)
    gtb = np.full((batch, 56, 4), -1, np.float32)
    gti = np.full((batch, 56, 1), -1, np.float32)
    gtb[:, 0] = [10, 10, 100, 100]
    gti[:, 0, 0] = 1
    b = {
        "image": jnp.asarray(rs.rand(batch, S, S, 3), jnp.float32),
        "gt_boxes": jnp.asarray(gtb),
        "gt_ids": jnp.asarray(gti),
    }
    state, m = step(state, b)
    jax.device_get(m["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, b)
    jax.device_get(m["total"])
    return batch * iters / (time.perf_counter() - t0)


res = {}
for name, batch, s2d, remat in CONFIGS:
    try:
        res[name] = round(bench_one(batch, s2d, remat), 1)
    except Exception as e:
        res[name] = f"error: {type(e).__name__}: {str(e)[:120]}"
    print(name, res[name], flush=True)
print(json.dumps(res))
