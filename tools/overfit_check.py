"""Training-correctness evidence: overfit tiny synthetic sets on the chip.

The environment has no real VOC/VID data, so mAP parity with the reference
cannot be measured here; this drives the full jitted train step (forward +
on-device targets + loss + backward + SGD + BN stats) until it memorises a
tiny set, then checks the detect path recovers the boxes (IoU + class).

Four configs, one per training-semantics family (select with --configs):

  yolov3  plain 2D YOLOv3 — the base result (loss 1278 -> 1.8, IoU 0.995
          on v5e, r2)
  k3      YOLOv3T k=3 late-max join — the windowed temporal family
          (reference yolo3.py:1107-1140 joins; per-window single loss)
  t5      YOLOv3Temporal t=5 t_out + corr pyramid — per-timestep heads and
          per-timestep loss averaging (reference yolo3_temporal.py:448-468,
          :515-528; train/step.py folds T into the batch axis)
  tree    CombinedDetection-style multi-hot ancestor labels on a mini
          WordNet-style tree (reference datasets/combined.py:186-202;
          multi-hot rows pass through target gen verbatim, ops/targets.py)

Each config writes tools/overfit/<name>.json (tmp+rename) with loss
descent, mean top-1 IoU, and class recovery, and prints the same line.
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import postprocess, postprocess_tout  # noqa: E402
from videoyolo_tpu.train.lr import lr_schedule  # noqa: E402
from videoyolo_tpu.train.step import create_train_state, make_train_step  # noqa: E402

B, S, STEPS = 8, 160, 400
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "overfit")

# distinguishable solid patch colors (up to 4 classes)
_COLORS = [
    [0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9], [0.9, 0.9, 0.1],
]


def synth_set(num_classes, seed=0):
    """8 images: one solid color patch on noise, one box each."""
    rs = np.random.RandomState(seed)
    images = rs.rand(B, S, S, 3).astype(np.float32) * 0.3
    gtb = np.full((B, 8, 4), -1, np.float32)
    gti = np.full((B, 8, 1), -1, np.float32)
    for i in range(B):
        x1, y1 = rs.randint(10, 60), rs.randint(10, 60)
        w, h = rs.randint(40, 80), rs.randint(40, 80)
        x2, y2 = min(x1 + w, S - 1), min(y1 + h, S - 1)
        cls = i % num_classes
        images[i, y1:y2, x1:x2] = _COLORS[cls]
        gtb[i, 0] = [x1, y1, x2, y2]
        gti[i, 0, 0] = cls
    return images, gtb, gti


def iou(a, b):
    tl = np.maximum(a[:2], b[:2])
    br = np.minimum(a[2:], b[2:])
    wh = np.maximum(br - tl, 0)
    inter = wh[0] * wh[1]
    area = lambda x: (x[2] - x[0]) * (x[3] - x[1])  # noqa: E731
    return inter / max(area(a) + area(b) - inter, 1e-9)


def run(name, model, num_classes, batch, eval_fn, gtb, cls_ok_fn, steps=None):
    """Overfit `batch` through the full jitted train step, then check the
    detect path recovers each image's box (top-1 IoU) and class."""
    steps = STEPS if steps is None else steps
    variables = model.init(
        jax.random.PRNGKey(0),
        jax.tree_util.tree_map(lambda x: x[:1], batch["image"]),
        train=False,
    )
    lr_fn = lr_schedule("cosine", 5e-4, steps_per_epoch=steps, epochs=1,
                        warmup_epochs=0.1)
    state = create_train_state(model, variables, lr_fn)
    step = jax.jit(make_train_step(model, num_classes=num_classes),
                   donate_argnums=(0,))
    losses = []
    for i in range(steps):
        state, m = step(state, batch)
        if i % 50 == 0 or i == steps - 1:
            losses.append(float(jax.device_get(m["total"])))
            print(f"[{name}] step {i}: loss {losses[-1]:.2f}", flush=True)

    ev_vars = {"params": state.params, "batch_stats": state.batch_stats}
    ids, scores, boxes = map(
        np.asarray, jax.jit(lambda im: eval_fn(ev_vars, im))(batch["image"])
    )
    ious, cls_ok = [], []
    for i in range(B):
        ious.append(float(iou(boxes[i, 0], gtb[i, 0])))
        cls_ok.append(bool(cls_ok_fn(i, int(ids[i, 0, 0]))))
    rec = {
        "config": name,
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "mean_top1_iou": float(np.mean(ious)),
        "top1_class_acc": float(np.mean(cls_ok)),
        "top1_scores": [float(scores[i, 0, 0]) for i in range(B)],
        "pass": bool(np.mean(ious) >= 0.9 and all(cls_ok)
                     and losses[-1] < losses[0] * 0.05),
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=OUT_DIR, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    os.replace(tmp, os.path.join(OUT_DIR, f"{name}.json"))
    print(json.dumps(rec), flush=True)
    return rec


def cfg_yolov3():
    from videoyolo_tpu.models.yolo3 import YOLOv3

    C = 3
    images, gtb, gti = synth_set(C)
    model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
    batch = {
        "image": jnp.asarray(images),
        "gt_boxes": jnp.asarray(gtb),
        "gt_ids": jnp.asarray(gti),
    }
    ev = lambda v, im: postprocess(*model.apply(v, im, train=False))
    return run("yolov3", model, C, batch, ev, gtb, lambda i, c: c == i % C)


def cfg_k3():
    """YOLOv3T k=3 late-max: a static 3-frame clip per sample, one loss per
    window (the join collapses the window before the heads)."""
    from videoyolo_tpu.models.yolo3_temporal import YOLOv3T

    C = 3
    images, gtb, gti = synth_set(C, seed=1)
    model = YOLOv3T(num_classes=C, k=3, k_join_type="max", k_join_pos="late",
                    dtype=jnp.bfloat16)
    clip = np.repeat(images[:, None], 3, axis=1)  # (B, 3, S, S, 3)
    batch = {
        "image": jnp.asarray(clip),
        "gt_boxes": jnp.asarray(gtb),
        "gt_ids": jnp.asarray(gti),
    }
    ev = lambda v, im: postprocess(*model.apply(v, im, train=False))
    return run("k3", model, C, batch, ev, gtb, lambda i, c: c == i % C)


def cfg_t5():
    """YOLOv3Temporal t=5 t_out + corr pyramid: per-timestep heads, per-
    timestep gt, per-timestep loss averaging.  Recovery checked on the
    middle timestep's detections (postprocess_tout -> (B, T, 100, .))."""
    from videoyolo_tpu.models.yolo3_temporal import YOLOv3Temporal

    C = 3
    images, gtb, gti = synth_set(C, seed=2)
    model = YOLOv3Temporal(num_classes=C, t=5, t_out=True, corr_d=2,
                           dtype=jnp.bfloat16)
    clip = np.repeat(images[:, None], 5, axis=1)  # (B, 5, S, S, 3)
    batch = {
        "image": jnp.asarray(clip),
        # per-timestep labels (B, T, M, .) — the mult_out contract
        "gt_boxes": jnp.asarray(np.repeat(gtb[:, None], 5, axis=1)),
        "gt_ids": jnp.asarray(np.repeat(gti[:, None], 5, axis=1)),
    }

    def ev(v, im):
        ids_t, sc_t, bb_t = postprocess_tout(*model.apply(v, im, train=False))
        return ids_t[:, 2], sc_t[:, 2], bb_t[:, 2]  # middle timestep

    return run("t5", model, C, batch, ev, gtb, lambda i, c: c == i % C)


# mini WordNet-style tree (reference datasets/trees/filtered_det.tree shape):
# 0 root -> 1 animal -> {3 dog, 4 cat}; 2 vehicle -> {5 car, 6 bike}
_TREE_PARENT = {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2}
_TREE_LEAVES = [3, 4, 5, 6]


def _branch(leaf):
    ids = [leaf]
    while ids[-1] in _TREE_PARENT:
        ids.append(_TREE_PARENT[ids[-1]])
    return ids


def cfg_tree():
    """CombinedDetection multi-hot tree loss (combined.py:186-202): each gt box
    carries a multi-hot row over the 7 tree nodes (leaf + every ancestor);
    target gen passes the rows through verbatim (ops/targets.py:137-140) and
    the class loss is sigmoid-CE per node.  Recovery: top-1 box IoU plus the
    top-1 class landing ON THE GT LEAF'S BRANCH (val-mode duplicated
    per-ancestor boxes make any branch node a correct detection)."""
    from videoyolo_tpu.models.yolo3 import YOLOv3

    C = 7
    images, gtb, _ = synth_set(4, seed=3)  # 4 leaf classes
    multi = np.zeros((B, 8, C), np.float32)
    leaves = []
    for i in range(B):
        leaf = _TREE_LEAVES[i % 4]
        leaves.append(leaf)
        multi[i, 0, _branch(leaf)] = 1.0
    model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
    batch = {
        "image": jnp.asarray(images),
        "gt_boxes": jnp.asarray(gtb),
        "gt_ids": jnp.asarray(multi),
    }
    ev = lambda v, im: postprocess(*model.apply(v, im, train=False))
    return run("tree", model, C, batch, ev, gtb,
               lambda i, c: c in _branch(leaves[i]))


CONFIGS = {"yolov3": cfg_yolov3, "k3": cfg_k3, "t5": cfg_t5, "tree": cfg_tree}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="yolov3,k3,t5,tree",
                    help="comma-separated subset of " + ",".join(CONFIGS))
    ap.add_argument("--steps", type=int, default=None,
                    help="override the per-config step count")
    args = ap.parse_args()
    if args.steps is not None:
        STEPS = args.steps
    for nm in args.configs.split(","):
        CONFIGS[nm.strip()]()
