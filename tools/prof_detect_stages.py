"""Per-stage time attribution for the B=128/416 bf16 detect step, plus the
two stem/decode probes from the r4 review.

Sections (--sections, comma list):
  stages  each backbone stage, the FPN head, the decode epilogue, top-k and
          NMS timed as separately-jitted graphs with HLO cost_analysis
          FLOPs -> an achieved-TFLOPS attribution table.  The sum of stages
          vs the fused full step bounds what XLA's cross-stage fusion buys.
  pad     input-channel padding of the 3->32 stem conv: the full detect
          step A/B'd with images zero-padded to 4 and 8 channels (classic
          TPU first-conv trick; the conv contracts 27 -> 36/72 lanes.
          Numerically identical to zero-padded weights).  Reference stem:
          darknet.py:132.
  decode  the decode epilogue (models/yolo3.decode_predictions) timed
          standalone per level at B=128 — the ceiling on what fusing it
          differently into the head conv's output handling could save.

Timing forces execution with a device_get round-trip (ROADMAP "Timing
discipline"); every graph warms twice before the timed loop.
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

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # logic-validation mode on the local CPU (the sitecustomize TPU plugin
    # overrides the env var; a config update after import wins)
    jax.config.update("jax_platforms", "cpu")
    from videoyolo_tpu.utils.general import cpu_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.darknet import DarknetStage  # noqa: E402
from videoyolo_tpu.models.layers import ConvBNLeaky  # noqa: E402
from videoyolo_tpu.models.yolo3 import (  # noqa: E402
    YOLOv3,
    decode_predictions,
    postprocess,
    select_topk_candidates,
)
from videoyolo_tpu.ops.anchors import DEFAULT_ANCHORS, DEFAULT_STRIDES  # noqa: E402
from videoyolo_tpu.ops.nms import box_nms  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--size", type=int, default=416)
ap.add_argument("--sections", default="stages,pad,decode")
args = ap.parse_args()
B, S = args.batch, args.size
sections = set(args.sections.split(","))


def _force(o):
    jax.device_get(jax.tree.leaves(o)[0].ravel()[:1])


def timeit(f, *fargs, iters=20):
    _force(f(*fargs))
    _force(f(*fargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*fargs)
    _force(o)
    return (time.perf_counter() - t0) / iters * 1e3


def hlo_flops(jf, *fargs):
    try:
        ca = jf.lower(*fargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def run_module(mod, x_shape, train=False):
    """jit `mod.apply` on zeros of x_shape with freshly-initialised params
    (timing is value-independent)."""
    x = jnp.zeros(x_shape, jnp.bfloat16)
    vs = mod.init(jax.random.PRNGKey(0), x, train=False)
    jf = jax.jit(lambda a: mod.apply(vs, a, train=train))
    return jf, x


out = {"batch": B, "size": S}

if "stages" in sections:
    specs = [
        ("conv0", ConvBNLeaky(32, kernel=3, stride=1, dtype=jnp.bfloat16), (B, S, S, 3)),
        ("stage1", DarknetStage(64, 1, dtype=jnp.bfloat16), (B, S, S, 32)),
        ("stage2", DarknetStage(128, 2, dtype=jnp.bfloat16), (B, S // 2, S // 2, 64)),
        ("stage3", DarknetStage(256, 8, dtype=jnp.bfloat16), (B, S // 4, S // 4, 128)),
        ("stage4", DarknetStage(512, 8, dtype=jnp.bfloat16), (B, S // 8, S // 8, 256)),
        ("stage5", DarknetStage(1024, 4, dtype=jnp.bfloat16), (B, S // 16, S // 16, 512)),
    ]
    table = {}
    for name, mod, shp in specs:
        jf, x = run_module(mod, shp)
        ms = timeit(jf, x)
        gf = hlo_flops(jf, x) / 1e9
        table[name] = {"ms": round(ms, 3), "gflops": round(gf, 1),
                       "tflops": round(gf / ms, 1)}
        print(f"[stages] {name}: {table[name]}", flush=True)

    # FPN head + decode: YOLOv3 with use_backbone=False on the three routes
    head = YOLOv3(num_classes=20, use_backbone=False, dtype=jnp.bfloat16)
    routes = (
        jnp.zeros((B, S // 8, S // 8, 256), jnp.bfloat16),
        jnp.zeros((B, S // 16, S // 16, 512), jnp.bfloat16),
        jnp.zeros((B, S // 32, S // 32, 1024), jnp.bfloat16),
    )
    hv = head.init(jax.random.PRNGKey(0), routes, train=False)
    jf = jax.jit(lambda r: head.apply(hv, r, train=False))
    ms = timeit(jf, routes)
    gf = hlo_flops(jf, routes) / 1e9
    table["head+decode"] = {"ms": round(ms, 3), "gflops": round(gf, 1),
                            "tflops": round(gf / ms, 1)}
    print(f"[stages] head+decode: {table['head+decode']}", flush=True)

    # detect tail: top-k candidate select + NMS on realistic scores
    n = sum((S // st) ** 2 * 3 for st in (8, 16, 32))
    rs = np.random.RandomState(0)
    boxes_r = jnp.asarray(rs.uniform(0, S, (B, n, 4)).astype(np.float32))
    scores_r = jnp.asarray((rs.uniform(0, 1, (B, n, 20)) ** 8).astype(np.float32))
    topk = jax.jit(select_topk_candidates)
    nms = jax.jit(lambda c: box_nms(c, topk=-1, presorted=True))
    cands = topk(boxes_r, scores_r)
    table["topk"] = {"ms": round(timeit(topk, boxes_r, scores_r), 3)}
    table["nms"] = {"ms": round(timeit(nms, cands), 3)}
    print(f"[stages] tail: topk {table['topk']}, nms {table['nms']}", flush=True)

    # the fused full step, for the sum-vs-fused comparison
    full_model = YOLOv3(num_classes=20, dtype=jnp.bfloat16)
    fv = full_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16), train=False
    )
    jfull = jax.jit(lambda im: postprocess(*full_model.apply(fv, im, train=False)))
    xfull = jnp.zeros((B, S, S, 3), jnp.bfloat16)
    full_ms = timeit(jfull, xfull)
    stage_sum = sum(v["ms"] for v in table.values())
    out["stages"] = table
    out["stage_sum_ms"] = round(stage_sum, 2)
    out["full_ms"] = round(full_ms, 2)
    out["full_fps"] = round(B / full_ms * 1e3, 1)
    print(json.dumps({k: out[k] for k in ("stage_sum_ms", "full_ms", "full_fps")}),
          flush=True)

if "pad" in sections:
    pad = {}
    for cin in (3, 4, 8):
        model = YOLOv3(num_classes=20, dtype=jnp.bfloat16)
        vs = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, S, S, cin), jnp.bfloat16),
            train=False,
        )
        jf = jax.jit(lambda im, vs=vs, m=model: postprocess(*m.apply(vs, im, train=False)))
        x = jnp.zeros((B, S, S, cin), jnp.bfloat16)
        ms = timeit(jf, x)
        pad[f"cin{cin}"] = {"full_ms": round(ms, 2), "fps": round(B / ms * 1e3, 1)}
        print(f"[pad] cin={cin}: {pad[f'cin{cin}']}", flush=True)
    out["pad"] = pad

if "decode" in sections:
    dec = {}
    total = 0.0
    for (aw, st) in zip(DEFAULT_ANCHORS[::-1], DEFAULT_STRIDES[::-1]):
        g = S // st
        pairs = tuple((aw[2 * j], aw[2 * j + 1]) for j in range(len(aw) // 2))
        pred = jnp.zeros((B, g, g, 75), jnp.bfloat16)
        jf = jax.jit(
            lambda p, pairs=pairs, st=st: decode_predictions(p, pairs, st, 20, False)
        )
        ms = timeit(jf, pred)
        total += ms
        dec[f"stride{st}"] = round(ms, 3)
        print(f"[decode] stride {st} ({g}x{g}): {ms:.3f} ms", flush=True)
    dec["total_ms"] = round(total, 3)
    out["decode"] = dec

print(json.dumps(out, indent=1))
