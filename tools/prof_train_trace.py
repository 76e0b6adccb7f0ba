"""Device-trace the B=48/416 bf16+s2d train step and aggregate op classes."""
import os, sys, time, json, collections, re, gzip, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import YOLOv3
from videoyolo_tpu.train.lr import lr_schedule
from videoyolo_tpu.train.step import create_train_state, make_train_step

B, S = 48, 416
model = YOLOv3(num_classes=20, dtype=jnp.bfloat16, s2d_stem=True)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), train=False)
lr_fn = lr_schedule("step", 1e-3, steps_per_epoch=100, epochs=10)
state = create_train_state(model, variables, lr_fn)
step = jax.jit(make_train_step(model, num_classes=20), donate_argnums=(0,))

rs = np.random.RandomState(0)
gtb = np.full((B, 56, 4), -1, np.float32); gtb[:, 0] = [10, 10, 100, 100]
gti = np.full((B, 56, 1), -1, np.float32); gti[:, 0, 0] = 1
batch = {
    "image": jnp.asarray(rs.rand(B, S, S, 3), jnp.float32),
    "gt_boxes": jnp.asarray(gtb),
    "gt_ids": jnp.asarray(gti),
}
state, m = step(state, batch)
jax.device_get(m["total"])

out = "/tmp/vy_train_trace"
with jax.profiler.trace(out):
    for _ in range(3):
        state, m = step(state, batch)
    jax.device_get(m["total"])

tr_file = sorted(glob.glob(out + "/plugins/profile/*/vm.trace.json.gz"))[-1]
with gzip.open(tr_file) as f:
    tr = json.load(f)
groups = collections.Counter()
total = 0
for e in tr.get("traceEvents", []):
    if e.get("ph") != "X" or "dur" not in e:
        continue
    n = e["name"]
    if n.startswith("$") or "jit_" in n or "block_until" in n or "trace" in n or "__exit__" in n or "PjitFunction" in n:
        continue
    total += e["dur"]
    groups[re.sub(r"[.\d]+$", "", n)] += e["dur"]
print("total %.1f ms/step" % (total / 3e3))
for k, v in groups.most_common(18):
    print(f"{v/3e3:8.2f} ms/step  {k}")
