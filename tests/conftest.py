"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (the reference had no equivalent —
its multi-GPU path could only be tested on GPUs, SURVEY.md §4)."""
import os

# hard override: the driver environment presets JAX_PLATFORMS=axon (remote
# TPU tunnel) — tests must run on the local virtual-8-device CPU backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: model compiles dominate test wall-clock.
import jax  # noqa: E402

# The box's sitecustomize registers a TPU PJRT plugin at interpreter start
# and pins jax_platforms to it, which silently overrides the env assignment
# above (tests would run single-TPU instead of the 8-device CPU mesh).  A
# config update AFTER import jax wins over both.
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"virtual CPU mesh not active: {jax.default_backend()} x{jax.device_count()}"
)

from videoyolo_tpu.utils.general import cpu_cache_dir  # noqa: E402

# CPU-fingerprint-keyed dir: mixed-fingerprint XLA:CPU AOT entries E-log on
# every load and risk SIGILL (this microVM's vCPU changes across boots)
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
# persist EVERY compile: on a 1-core host the suite's cost is hundreds of
# small per-op compiles (eager init/apply), all of which recur across runs
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


import pytest  # noqa: E402

# Lane split (markers declared in pytest.ini): modules whose tests compile a
# full model on XLA:CPU, drive a CLI subprocess, or fuzz — minutes each on
# this 1-core host — are `heavy`; everything else is `fast`, the <10 min
# smoke lane (`pytest -m fast`).  Module-level marking keeps the split in
# one audited list instead of scattered decorators.
HEAVY_MODULES = {
    "test_aux_models_utils",   # FlowNet/R21D/MobileNet/HDarknet compiles
    "test_detect_cli",         # detect_yolo3.py subprocess end-to-end
    "test_extract_cli",        # extract CLI subprocess
    "test_freeze_pretrained",  # full-model train-step compiles
    "test_inflate",            # 2D->3D inflation forward probes
    "test_model",              # YOLOv3 family forwards
    "test_multihost",          # two-process jax.distributed
    "test_native_train",       # native loader + train step
    "test_nms_fuzz",           # hypothesis fuzzing
    "test_no_backbone",        # no-backbone train/apply compiles
    "test_pallas_conv",        # pallas kernel compiles (CPU interpret)
    "test_pallas_nms",
    "test_pp",                 # pipeline-parallel apply
    "test_quantize",           # int8 conversions of every family
    "test_s2d",                # refolded-stem forwards
    "test_serving",            # export/reload round-trips
    "test_spatial",            # sharded apply vs replicated
    "test_stream_cli",         # streaming CLI subprocess
    "test_streaming",          # ring-buffer vs window recompute
    "test_surgery",            # reset_class weight surgery forwards
    "test_temporal_models",    # YOLOv3T/Temporal config sweep
    "test_train_cli",          # train CLI subprocess end-to-end
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(
            pytest.mark.heavy if mod in HEAVY_MODULES else pytest.mark.fast
        )


@pytest.hookimpl(optionalhook=True)
def pytest_xdist_auto_num_workers(config):
    """`pytest -n auto` wiring for multi-core hosts: one worker per core
    less one for the dispatcher.  On this 1-core box -n auto degenerates to
    a single worker — run the suite serially here; the hook exists so a
    TPU-VM-class host (~100 cores) can parallelise the compile-bound suite
    without extra flags (VERDICT r3 hygiene).  optionalhook: on a host
    without pytest-xdist the hook is simply unknown to pluggy — without the
    marker that is a PluginValidationError that INTERNALERRORs the whole
    suite before a single test runs."""
    return max(1, (os.cpu_count() or 1) - 1)
