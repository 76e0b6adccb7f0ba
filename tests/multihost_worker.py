"""Worker for the true multi-process multihost test (tests/test_multihost.py).

Launched twice by the harness: `python multihost_worker.py <pid> <port>`.
Each process initialises jax.distributed against a shared coordinator,
builds its OWN local shard of the global batch with the coordination-free
sampler, and assembles the logically-global array through
put_global_batch's jax.make_array_from_process_local_data branch — the
code path a single-process pytest can never reach
(parallel/multihost.py:78; scales out /root/reference/train_yolov3.py:596-606).
"""
import os
import sys

PID = int(sys.argv[1])
PORT = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# the box's sitecustomize registers the axon TPU plugin (which overrides
# JAX_PLATFORMS=cpu) whenever this trigger is set — strip it (same trick
# as __graft_entry__.dryrun_multichip)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# CPU backends are single-process unless a cross-process collectives
# implementation is selected before backend creation
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{PORT}", num_processes=2, process_id=PID
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from videoyolo_tpu.parallel.multihost import (  # noqa: E402
    local_batch_size,
    process_epoch_indices,
    put_global_batch,
)

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert len(jax.local_devices()) == 2

mesh = Mesh(np.array(jax.devices()), ("data",))

# A deterministic global "dataset": sample i is the row filled with i.
N, FEAT, GLOBAL_BS = 24, 6, 8
data = np.arange(N, dtype=np.float32)[:, None] * np.ones((1, FEAT), np.float32)

lb = local_batch_size(GLOBAL_BS)
assert lb == 4

sum_step = jax.jit(lambda a: jnp.sum(a))

for epoch in range(2):
    mine = process_epoch_indices(N, epoch, seed=3)
    assert len(mine) == N // 2
    # lockstep: both processes take the same number of steps
    steps = len(mine) // lb
    got = []
    for s in range(steps):
        local = data[mine[s * lb : (s + 1) * lb]]
        batch = put_global_batch({"x": local}, mesh)
        arr = batch["x"]
        assert arr.shape == (GLOBAL_BS, FEAT), arr.shape  # logically global
        assert len(arr.sharding.device_set) == 4
        assert arr.addressable_shards[0].data.shape == (2, FEAT)
        got.append(float(sum_step(arr)))  # replicated result, forces assembly
    # per-epoch invariant: the summed global batches cover every sample of
    # the permuted (truncated) epoch exactly once across both processes
    total = sum(got)
    rng = np.random.RandomState(3 + epoch)
    perm = rng.permutation(N)[: (N // 2) * 2]
    expect = float(data[perm].sum())
    assert abs(total - expect) < 1e-3, (total, expect)
    print(f"proc{PID} epoch{epoch} OK total={total}", flush=True)

# coordinator gating + coordinated control flow (the train CLI's
# --max_epoch_time cutoff must be a joint decision — a lone early exit
# deadlocks the peers inside the gradient all-reduce)
from videoyolo_tpu.parallel.multihost import is_coordinator, sync_flag  # noqa: E402

assert is_coordinator() == (PID == 0)
# both processes call sync_flag at the same sequence points; everyone gets
# the COORDINATOR's value regardless of their own
assert sync_flag(PID == 0) is True  # coord says True
assert sync_flag(PID != 0) is False  # coord says False
print(f"proc{PID} syncflag OK", flush=True)

print(f"proc{PID} DONE", flush=True)
