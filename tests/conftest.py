"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (the reference had no equivalent —
its multi-GPU path could only be tested on GPUs, SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: model compiles dominate test wall-clock.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
