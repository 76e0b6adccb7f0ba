"""Train-step MFU experiments (the ROADMAP "wgrad-friendly layout" lever).

The r2 trace showed the B=48/416 bf16+s2d train step at ~48% MFU with a
clean 1:2 fwd:bwd conv split and no pathological ops — the remaining loss
is conv efficiency in the backward pass (wgrad contractions) and scheduling.
This tool measures the concrete knobs we can actually turn under XLA/TPU,
forced-timing, one JSON line per variant:

  baseline      the bench recipe (B=48, bf16, s2d stem, no remat)
  donate_batch  donate the batch buffers too (frees their HBM for bwd)
  remat_stem    selective remat of the three high-res groups
  remat_full    full-backbone remat
  b64 / b96     larger global batch (full remat where it OOMs without)
  u8_color      production input contract (uint8 pixels + on-device color)

Usage: python tools/prof_wgrad.py [--iters 10] [--only baseline,b64]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.yolo3 import YOLOv3
from videoyolo_tpu.train.lr import lr_schedule
from videoyolo_tpu.train.step import create_train_state, make_train_step

S = 416


def make_batch(b, u8_color=False):
    rs = np.random.RandomState(0)
    gtb = np.full((b, 56, 4), -1, np.float32)
    gti = np.full((b, 56, 1), -1, np.float32)
    gtb[:, 0] = [10, 10, 100, 100]
    gti[:, 0, 0] = 1
    batch = {"gt_boxes": jnp.asarray(gtb), "gt_ids": jnp.asarray(gti)}
    if u8_color:
        from videoyolo_tpu.data.transforms import sample_color_matrix

        np.random.seed(0)
        batch["image"] = jnp.asarray(
            rs.randint(0, 255, (b, S, S, 3), dtype=np.uint8)
        )
        batch["color"] = jnp.asarray(
            np.stack([sample_color_matrix() for _ in range(b)]), jnp.float32
        )
    else:
        batch["image"] = jnp.asarray(rs.rand(b, S, S, 3), jnp.float32)
    return batch


def run(name, b, remat=False, donate_batch=False, u8_color=False, iters=10):
    model = YOLOv3(num_classes=20, dtype=jnp.bfloat16, s2d_stem=True, remat=remat)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), train=False
    )
    lr_fn = lr_schedule("step", 1e-3, steps_per_epoch=100, epochs=10)
    state = create_train_state(model, variables, lr_fn)
    donate = (0, 1) if donate_batch else (0,)
    step = jax.jit(make_train_step(model, num_classes=20), donate_argnums=donate)
    batch = make_batch(b, u8_color=u8_color)

    def fresh():
        return {k: jnp.copy(v) for k, v in batch.items()} if donate_batch else batch

    state, m = step(state, fresh())
    jax.device_get(m["total"])  # compile + warm
    state, m = step(state, fresh())
    jax.device_get(m["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, fresh())
    jax.device_get(m["total"])
    dt = time.perf_counter() - t0
    rate = b * iters / dt
    out = {"variant": name, "batch": b, "img_s": round(rate, 1),
           "ms_step": round(dt / iters * 1e3, 2)}
    print(json.dumps(out), flush=True)
    return out


VARIANTS = {
    "baseline": dict(b=48),
    "donate_batch": dict(b=48, donate_batch=True),
    "remat_stem": dict(b=48, remat="stem"),
    "remat_full": dict(b=48, remat=True),
    "b64": dict(b=64, remat=True),
    "b96": dict(b=96, remat=True),
    "u8_color": dict(b=48, u8_color=True),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--only", type=str, default="")
    args = p.parse_args()
    names = args.only.split(",") if args.only else list(VARIANTS)
    for name in names:
        try:
            run(name, iters=args.iters, **VARIANTS[name])
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
