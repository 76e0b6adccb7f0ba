"""Training-correctness evidence: overfit 8 synthetic images on the chip.

The environment has no real VOC/VID data, so mAP parity with the reference
cannot be measured here; this drives the full jitted train step (forward +
on-device targets + loss + backward + SGD + BN stats) until it memorises a
tiny set, then checks the detect path recovers the boxes.  Prints one JSON
line with initial/final loss and mean IoU of the top detection per image.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.train.lr import lr_schedule
from videoyolo_tpu.train.step import create_train_state, make_train_step

B, S, C, STEPS = 8, 160, 3, 400
rs = np.random.RandomState(0)

# 8 images: solid color patches on noise, one box each
images = rs.rand(B, S, S, 3).astype(np.float32) * 0.3
gtb = np.full((B, 8, 4), -1, np.float32)
gti = np.full((B, 8, 1), -1, np.float32)
for i in range(B):
    x1, y1 = rs.randint(10, 60), rs.randint(10, 60)
    w, h = rs.randint(40, 80), rs.randint(40, 80)
    x2, y2 = min(x1 + w, S - 1), min(y1 + h, S - 1)
    cls = i % C
    images[i, y1:y2, x1:x2] = [[0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9]][cls]
    gtb[i, 0] = [x1, y1, x2, y2]
    gti[i, 0, 0] = cls

model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), train=False)
lr_fn = lr_schedule("cosine", 5e-4, steps_per_epoch=STEPS, epochs=1, warmup_epochs=0.1)
state = create_train_state(model, variables, lr_fn)
step = jax.jit(make_train_step(model, num_classes=C), donate_argnums=(0,))

batch = {
    "image": jnp.asarray(images),
    "gt_boxes": jnp.asarray(gtb),
    "gt_ids": jnp.asarray(gti),
}
losses = []
for i in range(STEPS):
    state, m = step(state, batch)
    if i % 50 == 0 or i == STEPS - 1:
        losses.append(float(jax.device_get(m["total"])))
        print(f"step {i}: loss {losses[-1]:.2f}", flush=True)

ev_vars = {"params": state.params, "batch_stats": state.batch_stats}
ids, scores, boxes = jax.jit(
    lambda im: postprocess(*model.apply(ev_vars, im, train=False))
)(jnp.asarray(images))
ids, scores, boxes = map(np.asarray, (ids, scores, boxes))


def iou(a, b):
    tl = np.maximum(a[:2], b[:2]); br = np.minimum(a[2:], b[2:])
    wh = np.maximum(br - tl, 0)
    inter = wh[0] * wh[1]
    area = lambda x: (x[2] - x[0]) * (x[3] - x[1])  # noqa: E731
    return inter / max(area(a) + area(b) - inter, 1e-9)


ious, cls_ok = [], []
for i in range(B):
    ious.append(float(iou(boxes[i, 0], gtb[i, 0])))
    cls_ok.append(bool(ids[i, 0, 0] == gti[i, 0, 0]))
print(json.dumps({
    "loss_first": losses[0],
    "loss_last": losses[-1],
    "mean_top1_iou": float(np.mean(ious)),
    "top1_class_acc": float(np.mean(cls_ok)),
    "top1_scores": [float(scores[i, 0, 0]) for i in range(B)],
}))
