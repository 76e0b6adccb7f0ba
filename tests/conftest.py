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

jax.config.update("jax_compilation_cache_dir", "/tmp/videoyolo_tpu_jax_cache")
# persist EVERY compile: on a 1-core host the suite's cost is hundreds of
# small per-op compiles (eager init/apply), all of which recur across runs
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
