"""Headline benchmark: yolo3_darknet53 at 416 px on one chip.

Prints a full JSON result line after EVERY completed section (flushed), each
line a superset of the previous — so whatever instant the driver samples or
kills this process, the tail of stdout contains one complete, parseable line
with everything measured so far.  Round 3 shipped nothing because the old
single-print-at-exit structure lost all ten sections to a timeout
(BENCH_r03.json rc=124, parsed=null); this structure cannot lose more than
the section in flight.

Why sections are slow AND why that is unfixable by caching (measured, r4):
the axon remote-TPU plugin takes 100-300 s to make ANY large executable
runnable — a fresh B=128 detect compile measured 370 s, a persistent-cache
HIT on the same graph 237 s, and a cache hit on a 6 MB params-as-arguments
variant still 150 s — the cost is the remote executable load/link, not
compilation or deserialization, so the persistent cache cannot save it.
Defences used here, in order of value:
  1. progressive full-line emission (above);
  2. compile CONCURRENCY: EVERY section's graph build + compile — the
     detect headline included — is submitted to a small thread pool up
     front (the work is server-side; host threads just wait), while the
     main thread measures each section as its compile resolves.  Measured
     sections serialise on one lock; prep threads don't take it (see
     _DEV_LOCK comment for the starvation-vs-noise tradeoff).  r4 proved
     the old headline-first ordering fatal: under a slow compile service
     the clean headline alone ate 1641 s of the 1800 s budget and starved
     the temporal/stream/latency/e2e sections entirely.  Now a slow
     service costs value *cleanliness* (contended lower bounds), never
     value *presence*; the idle re-measure (detect first) claims the
     clean names when the service allows;
  3. a wall-clock budget (env BENCH_BUDGET_S, default 1800): sections whose
     compile has not resolved by the deadline are reported in "skipped";
  4. SIGTERM/SIGALRM handlers that dump the current full line and exit, so
     an external `timeout` still yields a parseable artifact.

Fields (all rates frames- or images-/sec):

  metric/value/unit/vs_baseline  detect throughput (fwd + decode + NMS),
                                 bf16, B=128, best of 3 timed blocks;
                                 detect_fps_min/_median quantify the
                                 tunnel's run-to-run spread
  detect_int8_fps                the --quantize fused int8 serving path
                                 (BN-folded per-channel int8 weights,
                                 int8 activations across cells/joins)
  train_img_s                    jitted train-step throughput (fwd + on-
                                 device targets + loss + bwd + SGD), bf16,
                                 B=48, space-to-depth stem, no remat — the
                                 fastest measured single-chip recipe — on
                                 the loader's uint8+color wire contract
                                 (parity with f32 inputs per the r3 wgrad
                                 table; lets e2e reuse this executable)
  temporal_k3_fps                YOLOv3T k=3 late-max detect frames/s (B=32)
  temporal_t5_fps                YOLOv3Temporal t=5 (t_out + corr pyramid)
                                 detect frames/s (B=16)
  stream_k3_fps                  streaming sliding-window detection
                                 (streaming.py ring buffer), k=3 late-max,
                                 B=32 streams: detected frames/s at ONE
                                 backbone pass per frame (the windowed
                                 model's stride-1 detection rate is
                                 temporal_k3_fps / k)
  loader_img_s                   host input pipeline alone (JPEG decode +
                                 full train augmentation -> uint8+color
                                 batches) on this host's cores
  transfer_img_s                 host->device transfer alone (staged
                                 device_put of pre-built batches, no step) —
                                 attributes the e2e gap: e2e ~= min(loader,
                                 transfer, device)
  e2e_train_img_s                loader feeding the train step through the
                                 async device-prefetcher (data/prefetch.py).
                                 On this tunneled 1-core box loader and
                                 transfer SERIALISE on the single core, so
                                 the reachable bound is harmonic:
                                 1/(1/loader + 1/transfer); measured e2e
                                 sits at ~90% of it (r3: 41.6 vs a 46.2
                                 bound from loader 151 + transfer 67 —
                                 tunnel rates fluctuate run to run).  On a
                                 TPU-VM (PCIe/DMA, ~100 cores) loader,
                                 transfer and compute overlap and e2e
                                 approaches min(loader, device)
  latency_b1_bf16_ms /           single-request serving latency at B=1:
  latency_b1_int8_ms             device-side step time measured tunnel-proof
                                 by chaining dependent steps inside one
                                 dispatch (videoyolo_tpu/profiling.py
                                 chain method) — the per-request number a
                                 directly-attached deployment sees.  Two
                                 independent sections ("latency" bf16,
                                 "latency_int8"): the bf16 chain needs only
                                 the detect model handoff, so it is never
                                 hostage to int8 calibration
  host_cpus                      cores available to the loader (this box
                                 has 1; TPU-VMs have ~100+)
  sections_s / skipped /         per-section wall seconds (compile wait +
  bench_wall_s / budget_s        measure), sections dropped by the budget,
                                 total wall time, the budget applied
  remeasured_idle /              in-flight remote compiles degrade
  *_contended                    concurrent device (and 1-core host)
                                 execution arbitrarily (r4: the same k=3
                                 graph measured 29.5-1929 fps depending on
                                 in-flight compiles).  A value measured
                                 while any section compile was outstanding
                                 is therefore stored under a *_contended
                                 name (timeout resilience only); once the
                                 last prep resolves every section is
                                 re-measured on the idle device/host and
                                 the clean value lands under the real name
                                 (remeasured_idle lists them)

Baseline derivation: the reference publishes no numbers (BASELINE.md;
models/README.md's results table is 'TODO').  The accepted proxy for
"reference GPU frames/sec/chip" is gluoncv's yolo3_darknet53 inference
throughput on one V100 — widely reported at ~60-80 fps batched at 416 px
(gluoncv model-zoo detection benchmarks); we pin 70.  The north star is
>=5x that per chip (BASELINE.json), i.e. vs_baseline >= 5.0.

All timings force execution with jax.device_get (async dispatch otherwise
under-reports; round-1's train-side numbers suffered exactly that).

Env knobs: BENCH_BUDGET_S (wall budget, default 1740 — 60 s inside the
driver's ~1800 s external kill, so bench reports its own skips and exits
rc=0 rather than dying to SIGTERM mid-wait); BENCH_ONLY (comma-separated
section names, e.g. "detect,int8" — the detect prep always runs regardless
since int8/latency build on its model handoff).  Section dependencies:
"latency_int8" auto-creates the "int8" prep it needs (the calibrated
model); "e2e" needs "train" AND "loader" listed (it reuses the train
section's executable on the loader's batches) — listing e2e without them
reports it under "skipped".
"""
from __future__ import annotations

import json
import os
import signal
import threading
import time
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor
from concurrent.futures import wait as fwait

import numpy as np

import jax
import jax.numpy as jnp

REFERENCE_FPS = 70.0  # documented proxy, see module docstring
BATCH = 128  # detect: measured sweet spot on v5e (amortises launch overhead)
SIZE = 416
WARMUP = 3
ITERS = 20
TRAIN_BATCH = 48  # fastest measured train config (s2d stem, no remat)
TRAIN_ITERS = 10

T_START = time.perf_counter()
# Default 1740, NOT 1800: the driver kills the process externally at ~1800 s
# (BENCH_r04.json died to that SIGTERM at 1797.9 s, before the internal
# budget could mark unresolved sections as skipped).  Keeping the internal
# budget 60 s inside the external one means bench wraps up, reports skips,
# and exits rc=0 on its own terms.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1740"))

RESULTS: dict = {}  # enriched fields, updated as sections land
SECTIONS_S: dict = {}  # per-section wall time
SKIPPED: list = []
WANTED: list = []  # every section this run intends to measure (emit uses it
# to report still-unresolved sections as skipped on final/aborted dumps)
# cross-prep handoffs: prep threads publish intermediate products (model +
# variables) here and set the event, so dependent preps start compiling
# without waiting for the upstream prep's own (much slower) compile
HANDOFF: dict = {}
HANDOFF_EVENTS = {"detect_model": threading.Event(), "int8_model": threading.Event()}
# RLock, not Lock: the SIGTERM/SIGALRM handler runs ON the main thread and
# calls emit(); if the signal lands while the main thread is already inside
# emit() holding the lock, a plain Lock would deadlock the handler against
# itself and kill all three timeout defences at once.
_EMIT_LOCK = threading.RLock()
# Measurements hold this for their timed window so two measured sections
# never overlap on the device.  Prepare threads deliberately do NOT take it:
# a prep whose first call compiles AND executes (quantize calibration,
# streaming warm-up) would hold it for minutes and starve every
# ready-to-measure section.  The residual risk is a stray sub-second prep
# dispatch landing inside a multi-second pipelined timed window (<~2%
# distortion) — any value taken while preps are outstanding is labelled
# *_contended anyway, and the idle re-measure pass rewrites the clean names.
_DEV_LOCK = threading.Lock()


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def emit(final: bool = False, aborted: str | None = None) -> None:
    """Print ONE complete JSON line with everything measured so far.

    Runs concurrently with the main thread (watchdog + signal handler), so
    it never iterates the live dicts: .copy()/list() are single C calls,
    atomic under the GIL, immune to 'dictionary changed size during
    iteration'.  Worst case a snapshot lands mid-rename (pop+set) and one
    key is transiently absent from that line — the next emit has it.
    """
    results = RESULTS.copy()
    sections = SECTIONS_S.copy()
    skipped = list(SKIPPED)
    with _EMIT_LOCK:
        # headline: prefer the clean idle value; a run killed before the
        # idle re-measure still carries the contended lower bound as its
        # value (flagged) rather than null
        headline = results.get("detect_fps")
        headline_contended = False
        if headline is None and results.get("detect_fps_contended") is not None:
            headline = results["detect_fps_contended"]
            headline_contended = True
        line = {
            "metric": "detect_fps_416_bf16_per_chip",
            "value": headline,
            "unit": "frames/sec",
            "vs_baseline": (
                round(headline / REFERENCE_FPS, 3) if headline else None
            ),
        }
        if headline_contended:
            line["value_is_contended_lower_bound"] = True
        for k, v in results.items():
            if k != "detect_fps":
                line[k] = v
        line["host_cpus"] = os.cpu_count()
        line["bench_wall_s"] = round(time.perf_counter() - T_START, 1)
        line["budget_s"] = BUDGET_S
        line["sections_s"] = {k: round(v, 1) for k, v in sections.items()}
        if final or aborted:
            # sections still unresolved when the process is going down are
            # skipped in every sense that matters — name them, so a killed
            # run reports WHAT it lost, not just that it was killed
            skipped = skipped + [
                n
                for n in WANTED
                if n not in sections
                and n not in skipped
                and f"{n}_error" not in results
            ]
        if skipped:
            line["skipped"] = skipped
        if final:
            line["final"] = True
        if aborted:
            line["aborted"] = aborted
        print(json.dumps(line), flush=True)


def _install_signal_dump() -> None:
    """Three layers of timeout defence (progressive emit() lines are the
    fourth and primary one):

    1. SIGTERM/SIGALRM handlers — dump the current line and exit.  These
       only run when the main thread is executing Python bytecode; measured
       on this box, a SIGTERM landing while the main thread is blocked
       inside an XLA compile/execute C call is deferred until that call
       returns (i.e. possibly forever before a SIGKILL follows).
    2. A daemon WATCHDOG THREAD — immune to the C-block problem (it only
       needs to print) — emits a final line and exits the process shortly
       after the budget, so an external `timeout` longer than BENCH_BUDGET_S
       always finds a complete line in the tail and sees rc=0.
    3. signal.alarm as a backstop between the two.
    """

    def _dump(signum, frame):
        emit(final=True, aborted=signal.Signals(signum).name)
        os._exit(0)

    signal.signal(signal.SIGTERM, _dump)
    signal.signal(signal.SIGALRM, _dump)
    signal.alarm(int(BUDGET_S + 60))

    def _watchdog():
        time.sleep(BUDGET_S + 30 - (time.perf_counter() - T_START))
        emit(final=True, aborted="budget_watchdog")
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()


def _time_rate(step, x, n_frames: int, warmup: int = WARMUP, iters: int = ITERS):
    """Warm, run `iters`, force with device_get; returns frames/sec.
    `step` must already be compiled — only executions happen here."""
    for _ in range(warmup):
        jax.device_get(step(x)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(x)
    jax.device_get(out[0])
    return n_frames * iters / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# concurrent sections: prepare() compiles (thread pool), measure() executes
# (main thread, under _DEV_LOCK).  prepare returns whatever measure needs.
# The headline detect section is a pool section like every other (r4's
# headline-first serialisation starved everything behind it — see docstring).
# ---------------------------------------------------------------------------


def prep_detect():
    from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess

    # pad_stem: bit-equivalent input-channel-padded stem, +7.7% full step
    # (round-5 attribution, tools/prof_detect_stages.py); int8 and latency
    # sections inherit it through this model
    try:
        model = YOLOv3(num_classes=20, dtype=jnp.bfloat16, pad_stem=True)
        x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16),
            train=False,
        )
        # publish model+variables BEFORE the (minutes-long) compile: int8's
        # calibration and the bf16 latency chain need only these, so their
        # preps start immediately instead of queueing behind this compile
        HANDOFF["detect_model"] = (model, variables, x)
    finally:
        # set even on failure: a dependent prep then fails fast on the
        # missing HANDOFF key instead of waiting forever on a pool thread
        HANDOFF_EVENTS["detect_model"].set()

    @jax.jit
    def step(images):
        boxes, scores = model.apply(variables, images, train=False)
        return postprocess(boxes, scores)

    compiled = step.lower(x).compile()
    return compiled, model, variables, x


def measure_detect(prep):
    compiled, _model, _variables, x = prep
    jax.device_get(compiled(x)[0])  # first dispatch (remote executable load)
    rates = sorted(_time_rate(compiled, x, BATCH, warmup=1) for _ in range(3))
    RESULTS["detect_fps"] = round(rates[-1], 2)  # best of 3
    RESULTS["detect_fps_min"] = round(rates[0], 2)
    RESULTS["detect_fps_median"] = round(rates[1], 2)


def prep_int8():
    from videoyolo_tpu.models.yolo3 import postprocess
    from videoyolo_tpu.ops.quantize import quantize_fused

    try:
        HANDOFF_EVENTS["detect_model"].wait()
        model, variables, x = HANDOFF["detect_model"]
        qmodel, qvars = quantize_fused(
            model, variables, [x[:8].astype(jnp.float32)]
        )
        HANDOFF["int8_model"] = (qmodel, qvars)
    finally:
        HANDOFF_EVENTS["int8_model"].set()

    @jax.jit
    def step(images):
        boxes, scores = qmodel.apply(qvars, images, train=False)
        return postprocess(boxes, scores)

    compiled = step.lower(x).compile()
    return compiled, qmodel, qvars, x


def measure_int8(prep):
    compiled, _qm, _qv, x = prep
    RESULTS["detect_int8_fps"] = round(_time_rate(compiled, x, BATCH), 2)


def prep_train():
    """Train step in the LOADER'S wire contract — uint8 pixels + per-image
    (3,4) affine color matrix (augmentation+normalization applied on device,
    ops/color.py), gt padded to the loader's fixed 56 rows.  Measured at
    parity with the f32-input contract (470 vs 474 img/s, tools/
    prof_wgrad.py r3 table); using it here means the e2e section reuses THIS
    executable verbatim (prep_e2e) — one fewer 100-300 s remote load."""
    from videoyolo_tpu.models.yolo3 import YOLOv3
    from videoyolo_tpu.train.lr import lr_schedule
    from videoyolo_tpu.train.step import create_train_state, make_train_step

    model = YOLOv3(num_classes=20, dtype=jnp.bfloat16, s2d_stem=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False
    )
    lr_fn = lr_schedule("step", 1e-3, steps_per_epoch=100, epochs=10)
    state = create_train_state(model, variables, lr_fn)
    jit_step = jax.jit(make_train_step(model, num_classes=20), donate_argnums=(0,))

    rs = np.random.RandomState(0)
    gtb = np.full((TRAIN_BATCH, 56, 4), -1, np.float32)
    gti = np.full((TRAIN_BATCH, 56, 1), -1, np.float32)
    gtb[:, 0] = [10, 10, 100, 100]
    gti[:, 0, 0] = 1
    # plain normalize-only color maps (pixel/255 - mean)/std: the matrix
    # VALUES don't affect cost (same fused (3,4) affine per pixel), and
    # normalize-only keeps the loss landscape sane for the warm steps
    mean = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
    std = np.array([0.229, 0.224, 0.225], np.float32) * 255.0
    cmat = np.concatenate(
        [np.diag(1.0 / std), (-mean / std)[:, None]], axis=1
    ).astype(np.float32)
    batch = {
        "image": jnp.asarray(
            rs.randint(0, 255, (TRAIN_BATCH, SIZE, SIZE, 3)), jnp.uint8
        ),
        "gt_boxes": jnp.asarray(gtb),
        "gt_ids": jnp.asarray(gti),
        "color": jnp.asarray(np.broadcast_to(cmat, (TRAIN_BATCH, 3, 4)).copy()),
    }
    compiled = jit_step.lower(state, batch).compile()
    return compiled, jit_step, state, batch


def measure_train(prep, shared):
    compiled, jit_step, state, batch = prep
    # on idle re-measure the prep state's buffers were already donated
    # through the first measure — use the live state it produced
    state = shared.get("train_state", state)
    state, m = compiled(state, batch)
    jax.device_get(m["total"])  # warm
    t0 = time.perf_counter()
    for _ in range(TRAIN_ITERS):
        state, m = compiled(state, batch)
    jax.device_get(m["total"])
    RESULTS["train_img_s"] = round(
        TRAIN_BATCH * TRAIN_ITERS / (time.perf_counter() - t0), 1
    )
    shared["train_state"] = state
    shared["train_jit_step"] = jit_step


def _prep_temporal(cfg, b, k):
    from videoyolo_tpu.models.factory import build_model
    from videoyolo_tpu.models.yolo3 import postprocess_tout

    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(b, k, SIZE, SIZE, 3), jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, k, SIZE, SIZE, 3), jnp.bfloat16),
        train=False,
    )

    @jax.jit
    def step(im):
        boxes, scores = model.apply(variables, im, train=False)
        return postprocess_tout(boxes, scores)

    return step.lower(x).compile(), x, b * k


def prep_temporal_k3():
    from videoyolo_tpu.models.factory import YoloConfig

    return _prep_temporal(
        YoloConfig(
            num_classes=20, k=3, k_join_type="max", k_join_pos="late",
            dtype=jnp.bfloat16,
        ),
        32, 3,
    )


def prep_temporal_t5():
    from videoyolo_tpu.models.factory import YoloConfig

    return _prep_temporal(
        YoloConfig(
            num_classes=20, temporal=True, t_out=True, corr_pos="early",
            corr_d=4, dtype=jnp.bfloat16,
        ),
        16, 5,
    )


def measure_temporal(prep, key):
    compiled, x, n_frames = prep
    RESULTS[key] = round(_time_rate(compiled, x, n_frames, warmup=2), 1)


def prep_stream():
    """Streaming sliding-window detection (videoyolo_tpu/streaming.py):
    YOLOv3T k=3 late-max over B=32 parallel streams — ONE backbone pass per
    detected frame via the device route ring buffer.  Reported as detected
    frames/s; the windowed model at stride 1 pays k backbone passes per
    detection (temporal_k3_fps counts frames *processed*, so its stride-1
    detection rate is temporal_k3_fps / k)."""
    from videoyolo_tpu.models.factory import YoloConfig, build_model
    from videoyolo_tpu.streaming import StreamingDetector

    b, k = 32, 3
    model = build_model(
        YoloConfig(
            num_classes=20, k=k, k_join_type="max", k_join_pos="late",
            dtype=jnp.bfloat16,
        )
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, k, SIZE, SIZE, 3), jnp.bfloat16),
        train=False,
    )
    stream = StreamingDetector(model, variables)
    # distinct device-resident frames per step (repeated identical dispatch
    # under-reports over the tunnel — ROADMAP "Measurement discipline")
    rs = np.random.RandomState(0)
    frames = [
        jax.device_put(jnp.asarray(rs.rand(b, SIZE, SIZE, 3), jnp.bfloat16))
        for _ in range(ITERS)
    ]
    jax.device_get(stream.reset(frames[0])[0])
    jax.device_get(stream.step(frames[1])[0])
    return stream, frames, b


def measure_stream(prep):
    stream, frames, b = prep
    for f in frames[:WARMUP]:
        jax.device_get(stream.step(f)[0])
    t0 = time.perf_counter()
    for f in frames:
        out = stream.step(f)
    jax.device_get(out[0])
    RESULTS["stream_k3_fps"] = round(b * ITERS / (time.perf_counter() - t0), 1)


def prep_latency():
    """B=1 bf16 serving latency chain (lax.scan of 20 full steps — one of
    the most expensive compiles in the file).  Depends only on the detect
    MODEL handoff, not the detect compile, so it queues immediately."""
    from videoyolo_tpu.profiling import build_latency_chain

    HANDOFF_EVENTS["detect_model"].wait()
    model, variables, _x = HANDOFF["detect_model"]
    x1 = jnp.asarray(np.random.RandomState(1).rand(1, SIZE, SIZE, 3), jnp.bfloat16)
    return build_latency_chain(model, variables).lower(x1).compile(), x1


def prep_latency_int8():
    """int8 twin of prep_latency; waits on the CALIBRATED int8 model handoff
    (published by prep_int8 before its own B=128 compile)."""
    from videoyolo_tpu.profiling import build_latency_chain

    HANDOFF_EVENTS["int8_model"].wait()
    qmodel, qvars = HANDOFF["int8_model"]
    x1 = jnp.asarray(np.random.RandomState(1).rand(1, SIZE, SIZE, 3), jnp.bfloat16)
    return build_latency_chain(qmodel, qvars).lower(x1).compile(), x1


def measure_latency(prep):
    from videoyolo_tpu.profiling import chain_ms

    c_bf16, x1 = prep
    RESULTS["latency_b1_bf16_ms"] = round(chain_ms(c_bf16, x1), 2)


def measure_latency_int8(prep):
    from videoyolo_tpu.profiling import chain_ms

    c_int8, x1 = prep
    RESULTS["latency_b1_int8_ms"] = round(chain_ms(c_int8, x1), 2)


# ---------------------------------------------------------------------------
# host-side sections (no device compiles; run serially in the main thread)
# ---------------------------------------------------------------------------


class _SynthDataset:
    """256 synthetic JPEGs at VOC-typical size, labels known without decode
    (drives the loader's native augmented-decode path)."""

    native_train_ok = True

    def __init__(self, root="/tmp/videoyolo_bench_imgs", n=256, hw=(400, 500)):
        import cv2

        os.makedirs(root, exist_ok=True)
        self.paths = [os.path.join(root, f"{i:04d}.jpg") for i in range(n)]
        rs = np.random.RandomState(0)
        for p in self.paths:
            if not os.path.exists(p):
                cv2.imwrite(p, rs.randint(0, 255, (*hw, 3), np.uint8))
        self.wh = (hw[1], hw[0])
        self._transform = None
        self._inference = False

    def __len__(self):
        return len(self.paths)

    def sample_path(self, i):
        return self.paths[i]

    def _load_label(self, i):
        return np.array([[50.0, 60.0, 200.0, 220.0, i % 20, 0]])

    def label_and_size(self, i):
        return self._load_label(i), self.wh

    def __getitem__(self, i):
        from videoyolo_tpu.data.base import read_image

        img = read_image(self.paths[i])
        label = self._load_label(i)
        if self._transform is not None:
            return self._transform(img, label)
        return img, label


def _loader(epochs_len=256):
    from videoyolo_tpu.data.loader import DetectionLoader
    from videoyolo_tpu.data.transforms import YOLO3DefaultTrainTransform

    ds = _SynthDataset(n=epochs_len)
    return DetectionLoader(
        ds,
        batch_size=TRAIN_BATCH,
        shuffle=True,
        seed=0,
        num_workers=os.cpu_count() or 1,
        transform_factory=lambda w, h: YOLO3DefaultTrainTransform(
            w, h, device_color=True
        ),
        shape_sizes=[SIZE],
        last_batch="discard",
    )


def measure_loader(shared):
    loader = _loader()
    list(loader)  # warm (native .so build, file cache)
    t0 = time.perf_counter()
    n = 0
    for b in loader:
        shared.setdefault("first_batch", b)  # example batch for prep_e2e
        n += b["image"].shape[0]
    RESULTS["loader_img_s"] = round(n / (time.perf_counter() - t0), 1)
    shared["loader"] = loader


def measure_transfer(shared):
    """Host->device transfer alone: staged device_put of pre-built train
    batches (uint8 image + gt + color), no step.  Attributes the e2e gap:
    e2e_train_img_s ~= min(loader, transfer, device) on any host."""
    loader = shared.get("loader") or _loader()
    batches = [
        {k: v for k, v in b.items() if k in ("image", "gt_boxes", "gt_ids", "color")}
        for b in loader
    ]

    def one_pass():
        t0 = time.perf_counter()
        n = 0
        put = None
        for b in batches:
            put = {k: jax.device_put(v) for k, v in b.items()}
            n += b["image"].shape[0]
        # force with a data round-trip, not block_until_ready: over the axon
        # tunnel block can return before the transfers land (see tools/
        # prof_temporal._force); reading one element back is a true barrier
        jax.device_get(put["image"].ravel()[:1])
        return n / (time.perf_counter() - t0)

    one_pass()  # warm
    RESULTS["transfer_img_s"] = round(max(one_pass(), one_pass()), 1)


def prep_e2e(train_future, shared):
    """e2e = loader feeding the train executable.  The train section already
    compiles the loader's exact wire contract (uint8+color, see prep_train),
    so when the loader's example batch matches that spec — the normal case:
    same TRAIN_BATCH/SIZE/max_boxes — this prep is FREE: it returns the
    train section's compiled step.  Only on a spec mismatch does it lower a
    fresh executable (against state AVALS: the concrete state buffers are
    being donated through measure_train concurrently)."""
    compiled, jit_step, state, batch = train_future.result()
    dev = {
        k: jnp.asarray(v)
        for k, v in shared["first_batch"].items()
        if k in ("image", "gt_boxes", "gt_ids", "color")
    }
    spec = lambda t: jax.tree.map(lambda a: (a.shape, str(a.dtype)), t)  # noqa: E731
    if spec(dev) == spec(batch):
        return compiled, shared["loader"]
    compiled = jit_step.lower(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state), dev
    ).compile()
    return compiled, shared["loader"]


def measure_e2e(prep, shared):
    from videoyolo_tpu.data.prefetch import device_prefetch

    compiled, loader = prep
    state = shared["train_state"]

    def _stage(b):
        return {
            k: jax.device_put(v)
            for k, v in b.items()
            if k in ("image", "gt_boxes", "gt_ids", "color")
        }

    def one_epoch(state):
        t0 = time.perf_counter()
        n = 0
        m = None
        for dev in device_prefetch(iter(loader), size=2, transfer=_stage):
            state, m = compiled(state, dev)
            n += dev["image"].shape[0]
        assert m is not None, "empty epoch: dataset smaller than TRAIN_BATCH"
        jax.device_get(m["total"])
        return n / (time.perf_counter() - t0), state

    # best of two epochs: on a 1-core host the first epoch's thread
    # scheduling (loader workers + transfer thread + dispatch) is jittery
    r1, state = one_epoch(state)
    r2, state = one_epoch(state)
    RESULTS["e2e_train_img_s"] = round(max(r1, r2), 1)
    shared["train_state"] = state


# ---------------------------------------------------------------------------


def run_device_sections(futures, measures, want) -> None:
    """Measure each device section as its compile resolves (step 4).

    `measures` is a priority-ordered [(name, measure_fn)]; `futures` maps
    names to the in-flight prep compiles.  The loop picks the highest-
    priority READY future each iteration and otherwise blocks on ANY
    pending compile — one slow/stuck high-priority compile must not starve
    already-resolved sections (a fixed-order fut.result() walk re-creates
    the r3 lose-everything-on-timeout mode this file exists to kill).

    A measurement taken while other section compiles are in flight at its
    start OR its end can be arbitrarily degraded (r4 observed 29.5-2859 fps
    for the same graphs depending on server load); it is kept, but under an
    explicit *_contended name — in a finally, so a mid-section exception
    can't leave partial keys under the clean names — and the idle
    re-measure (step 5) writes the real names.  Sections whose compile has
    not resolved when the budget expires land in SKIPPED.

    Unit-tested with stub futures in tests/test_bench_logic.py.
    """
    pending = []
    for name, measure in measures:
        if futures.get(name) is None:
            if want(name):
                SKIPPED.append(name)
            continue
        pending.append((name, measure))
    while pending:
        left = _remaining()
        if left <= 0:
            SKIPPED.extend(n for n, _ in pending)
            break
        ready = [(n, m) for n, m in pending if futures[n].done()]
        if not ready:
            fwait(
                {futures[n] for n, _ in pending},
                timeout=min(left, 15.0),
                return_when=FIRST_COMPLETED,
            )
            continue
        name, measure = ready[0]  # priority order among the ready ones
        pending.remove((name, measure))
        t0 = time.perf_counter()
        contended = any(not f.done() for f in futures.values())
        before = set(RESULTS)
        try:
            prep = futures[name].result()
            with _DEV_LOCK:
                measure(prep)
            SECTIONS_S[name] = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            RESULTS[f"{name}_error"] = repr(e)[:200]
        finally:
            if contended or any(not f.done() for f in futures.values()):
                for k in set(RESULTS) - before:
                    if not k.endswith("_error"):
                        RESULTS[k + "_contended"] = RESULTS.pop(k)
        emit()


def main():
    # persistent compile cache: useless for the big graphs (see module
    # docstring) but still saves the hundreds of small init/host-op
    # compiles.  Set here, not at import time: tests import this module on
    # the CPU backend, and repointing THEIR process at the TPU cache dir
    # would write mixed-backend AOT entries into it.
    jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _install_signal_dump()
    only = {
        s.strip() for s in os.environ.get("BENCH_ONLY", "").split(",") if s.strip()
    }

    def want(name):
        return not only or name in only

    # 1. launch EVERY device section's compile concurrently, detect included
    #    (r4: serialising a clean headline ahead of the pool starved all the
    #    other sections under a slow compile service — see module docstring).
    #    Submission order IS the priority order for a slow compile service:
    #    after the headline come the sections no driver artifact has ever
    #    captured (temporal/stream/latency), then train (feeds e2e), then
    #    int8 (captured in r4).  Dependent preps (int8, latency*) wait on
    #    HANDOFF events — published before the upstream compile — never on
    #    upstream futures, so they neither hold up the queue nor deadlock;
    #    max_workers covers every section (a dependency-waiting thread costs
    #    nothing; the real contention is the remote service's own queue).
    pool = ThreadPoolExecutor(max_workers=8)
    futures = {}
    # detect is unconditional: it is the headline and int8/latency feed off it
    futures["detect"] = pool.submit(prep_detect)
    if want("temporal_k3"):
        futures["temporal_k3"] = pool.submit(prep_temporal_k3)
    if want("temporal_t5"):
        futures["temporal_t5"] = pool.submit(prep_temporal_t5)
    if want("stream"):
        futures["stream"] = pool.submit(prep_stream)
    if want("latency"):
        futures["latency"] = pool.submit(prep_latency)
    if want("train"):
        futures["train"] = pool.submit(prep_train)
    if want("int8") or want("latency_int8"):
        futures["int8"] = pool.submit(prep_int8)
    if want("latency_int8"):
        futures["latency_int8"] = pool.submit(prep_latency_int8)
    shared = {}
    WANTED.extend(
        list(futures)
        + [n for n in ("loader", "transfer", "e2e") if want(n)]
    )

    # 3. host-only sections while the device compiles are in flight
    #    (loader work is host CPU; the compile threads are idle waits).
    #    loader never touches the device, so it must NOT contend for the
    #    device lock (prep_int8 can hold it for minutes of calibration);
    #    transfer does device_puts and takes it.
    for name, fn, needs_dev in (
        ("loader", measure_loader, False),
        ("transfer", measure_transfer, True),
    ):
        if not want(name):
            continue
        if _remaining() <= 0:
            SKIPPED.append(name)
            continue
        t0 = time.perf_counter()
        # contended if prep compiles were in flight at the START of the
        # measurement OR at its end: checking only afterwards would record
        # a run degraded for nearly its whole duration under the clean
        # field name whenever the last compile resolved just before the
        # check (r4 measured loader 36-85 img/s contended vs 151 idle).
        contended = any(not f.done() for f in futures.values())
        before = set(RESULTS)
        try:
            if needs_dev:
                with _DEV_LOCK:
                    fn(shared)
            else:
                fn(shared)
            SECTIONS_S[name] = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — a section must not kill the line
            RESULTS[f"{name}_error"] = repr(e)[:200]
        finally:
            # in a finally so a mid-section exception can't leave keys it
            # already wrote under the clean names
            if contended or any(not f.done() for f in futures.values()):
                for k in set(RESULTS) - before:
                    if not k.endswith("_error"):
                        RESULTS[k + "_contended"] = RESULTS.pop(k)
        emit()

    if want("e2e") and "train" in futures and "first_batch" in shared:
        futures["e2e"] = pool.submit(prep_e2e, futures["train"], shared)

    # 4. measure device sections as their compiles resolve, priority order
    #    (detect is the headline: highest priority among the ready; the
    #    never-before-driver-captured sections outrank the r4-captured ones)
    measures = [
        ("detect", measure_detect),
        ("temporal_k3", lambda p: measure_temporal(p, "temporal_k3_fps")),
        ("temporal_t5", lambda p: measure_temporal(p, "temporal_t5_fps")),
        ("stream", lambda p: measure_stream(p)),
        ("latency", lambda p: measure_latency(p)),
        ("train", lambda p: measure_train(p, shared)),
        ("e2e", lambda p: measure_e2e(p, shared)),
        ("int8", measure_int8),
        ("latency_int8", measure_latency_int8),
    ]
    run_device_sections(futures, measures, want)

    # 5. idle re-measure.  In-flight remote compiles measurably degrade
    # concurrent device execution (r4 measured: temporal_k3 685 fps while
    # 3-4 section compiles were in flight vs 1929 fps idle — the on-resolve
    # numbers above exist so a timeout still leaves a value, but they are
    # lower bounds).  Once every prep has resolved the device is idle;
    # re-run each successful measure and overwrite with the clean number.
    if all(f.done() for f in futures.values()):
        remeasured = []
        # detect (the headline) first so a budget expiry mid-pass still
        # leaves the clean headline; host sections last — with every prep
        # resolved the host core is idle whenever they run
        redo = measures + [
            (name, lambda _p, fn=fn: fn(shared))
            for name, fn in (("loader", measure_loader), ("transfer", measure_transfer))
        ]
        for name, measure in redo:
            if name not in SECTIONS_S:
                continue
            if name in dict(measures) and futures.get(name) is None:
                continue
            if _remaining() <= 60:
                break
            try:
                with _DEV_LOCK:
                    prep = futures[name].result() if name in futures else None
                    measure(prep)
                remeasured.append(name)
            except Exception as e:  # noqa: BLE001
                RESULTS[f"{name}_remeasure_error"] = repr(e)[:200]
                if "TPU backend error" in repr(e):
                    break  # a bad call can poison the stream; keep what we have
        if remeasured:
            # drop contended values superseded by a clean idle re-measure
            for k in list(RESULTS):
                if k.endswith("_contended") and k[: -len("_contended")] in RESULTS:
                    del RESULTS[k]
            RESULTS["remeasured_idle"] = remeasured
            emit()

    emit(final=True)
    pool.shutdown(wait=False, cancel_futures=True)
    os._exit(0)  # don't hang on stuck compile threads


if __name__ == "__main__":
    main()
