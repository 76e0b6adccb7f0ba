"""Real-chip numbers for the temporal family + the Pallas correlation kernel.

clip_fps counts CLIPS (windows) per second; frame throughput is k x that.

PROF_SECTIONS selects comma-separated sections (default all):
  k3     YOLOv3T k=3 late-max bf16
  t5     YOLOv3Temporal t_out + corr pyramid bf16
  corr   Pallas vs XLA correlation kernel
  ts     two-stream flownet gated-add: bf16 vs mixed static int8 (384px)
  t5q    YOLOv3Temporal bf16 vs static int8 (t_out corr path)
  rnn    conv-RNN tips (rnn_pos late/out, reference yolo3.py:1016-1019):
         bf16 vs MIXED static int8 (ConvBNLeaky cells int8, ConvRNN
         real-valued — see PARITY.md int8 guidance table)
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache2")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from videoyolo_tpu.models.factory import YoloConfig, build_model
from videoyolo_tpu.models.yolo3 import postprocess_tout

SECTIONS = set(os.environ.get("PROF_SECTIONS", "k3,t5,corr,ts,t5q,rnn").split(","))


def _force(o):
    """True barrier over the axon tunnel: a data round-trip of a tiny
    dependent slice.  block_until_ready can return before execution
    finishes here (a 8192^3 matmul 'timed' at an impossible 28 PFLOPS with
    block-only sync; device_get of a reduced output gives a sane 113
    TFLOPS), and fetching the full output would bill the tunnel's ~224 MB/s
    transfer to the kernel being timed."""
    jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1])


def timeit(f, *args, iters=10):
    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _force(o)
    return (time.perf_counter() - t0) / iters * 1e3


def jit_step(model, variables):
    # variables as a jit ARGUMENT, not a closure: the numpy trees the
    # quantizer returns would otherwise embed as HLO constants, and the
    # axon remote-compile tunnel 413s on the payload
    variables = jax.device_put(variables)

    @jax.jit
    def step(v, im):
        boxes, scores = model.apply(v, im, train=False)
        return postprocess_tout(boxes, scores)
    return lambda im: step(variables, im)


def bench_quant(cfg, b, k, s):
    """bf16 vs static-int8 (quantize_static handles mixed-precision families:
    BN-less / recurrent cells pass through real-valued) for one config."""
    from videoyolo_tpu.ops.quantize import quantize_static

    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(b, k, s, s, 3), jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, k, s, s, 3), jnp.bfloat16),
        train=False,
    )
    ms = timeit(jit_step(model, variables), x)
    out = {"bf16_ms": round(ms, 2), "bf16_clip_fps": round(b / ms * 1e3, 1),
           "bf16_frame_fps": round(b * k / ms * 1e3, 1)}
    qmodel, qvars = quantize_static(model, variables, [np.asarray(x[:8], np.float32)])
    qms = timeit(jit_step(qmodel, qvars), x)
    out.update({"int8_ms": round(qms, 2), "int8_clip_fps": round(b / qms * 1e3, 1),
                "int8_frame_fps": round(b * k / qms * 1e3, 1)})
    return out


def bench_cfg(cfg, b, k, s=416):
    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(b, k, s, s, 3), jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, k, s, s, 3), jnp.bfloat16), train=False
    )
    ms = timeit(jit_step(model, variables), x)
    return {"ms": round(ms, 2), "clip_fps": round(b / ms * 1e3, 1), "frame_fps": round(b * k / ms * 1e3, 1)}


res = {}
if "k3" in SECTIONS:
    res["yolov3t_k3_late_max_b32"] = bench_cfg(
        YoloConfig(num_classes=30, k=3, k_join_type="max", k_join_pos="late", dtype=jnp.bfloat16), 32, 3
    )
    print("k3", res["yolov3t_k3_late_max_b32"], flush=True)
if "t5" in SECTIONS:
    res["yolov3temporal_t5_b16"] = bench_cfg(
        YoloConfig(num_classes=30, temporal=True, t_out=True, corr_pos="early", corr_d=4, dtype=jnp.bfloat16), 16, 5
    )
    print("t5", res["yolov3temporal_t5_b16"], flush=True)

if "corr" in SECTIONS:
    # pallas correlation vs XLA fallback
    from videoyolo_tpu.ops import correlation as C
    from videoyolo_tpu.ops import pallas_correlation as PC
    rs = np.random.RandomState(0)
    f1 = jnp.asarray(rs.rand(16, 26, 26, 256), jnp.float32)
    f2 = jnp.asarray(rs.rand(16, 26, 26, 256), jnp.float32)
    try:
        xla_fn = jax.jit(lambda a, b: C.correlation(a, b, max_displacement=4, stride2=1))
        pl_fn = jax.jit(lambda a, b: PC.correlation_pallas(a, b, max_displacement=4))
        res["corr_xla_ms"] = round(timeit(xla_fn, f1, f2), 3)
        res["corr_pallas_ms"] = round(timeit(pl_fn, f1, f2), 3)
        out_a = np.asarray(xla_fn(f1, f2))
        out_b = np.asarray(pl_fn(f1, f2))
        res["corr_max_abs_diff"] = float(np.max(np.abs(out_a - out_b)))
    except Exception as e:
        res["corr_error"] = f"{type(e).__name__}: {str(e)[:200]}"

if "ts" in SECTIONS:
    # two-stream (flownet k=3, gated add): bf16 vs mixed-precision static
    # int8 (darknet-side cells int8, motion stream bf16 — replace_quant).
    # 384 not 416: the FlowNetS decoder (ours AND the reference's,
    # flownet.py:95 concat) only matches spatially for inputs divisible by
    # 64 — at 416, conv5 is 13 but deconv5 emits 14 in both frameworks.
    res["ts_flownet_k3_add_b16"] = bench_quant(
        YoloConfig(num_classes=30, motion_stream="flownet", k=3, add_type="add",
                   dtype=jnp.bfloat16), 16, 3, 384
    )
    print("ts", res["ts_flownet_k3_add_b16"], flush=True)

if "t5q" in SECTIONS:
    res["yolov3temporal_t5_int8_b16"] = bench_quant(
        YoloConfig(num_classes=30, temporal=True, t_out=True, corr_pos="early",
                   corr_d=4, dtype=jnp.bfloat16), 16, 5, 416
    )
    print("t5q", res["yolov3temporal_t5_int8_b16"], flush=True)

if "rnn" in SECTIONS:
    # conv-RNN tips/outputs: mixed static int8 quantises every ConvBNLeaky
    # cell, the ConvRNN carry stays real-valued (PARITY.md int8 guidance)
    for pos in ("late", "out"):
        key = f"rnn_{pos}_k3_b16"
        res[key] = bench_quant(
            YoloConfig(num_classes=30, k=3, k_join_type="max",
                       k_join_pos="late", rnn_pos=pos, dtype=jnp.bfloat16),
            16, 3, 416,
        )
        print(key, res[key], flush=True)

print(json.dumps(res))
