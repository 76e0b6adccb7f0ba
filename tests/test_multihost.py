"""Multi-host data sharding (parallel/multihost.py): coordination-free
per-process index partitioning + global-array assembly.  The reference is
single-node, so this surface is TPU-pod-only (SURVEY.md §2.10 extension)."""
import numpy as np
import pytest

from videoyolo_tpu.parallel.multihost import (
    local_batch_size,
    process_epoch_indices,
    put_global_batch,
)


def test_local_batch_size():
    assert local_batch_size(64, 4) == 16
    with pytest.raises(AssertionError):
        local_batch_size(64, 3)


def test_process_indices_partition_disjoint_and_covering():
    n, pc = 103, 4
    shards = [process_epoch_indices(n, 0, seed=7, process_index=p, process_count=pc) for p in range(pc)]
    allidx = np.concatenate(shards)
    assert len(allidx) == (n // pc) * pc  # drop_remainder
    assert len(np.unique(allidx)) == len(allidx)  # disjoint
    assert all(len(s) == n // pc for s in shards)
    # deterministic per (seed, epoch); different across epochs
    again = process_epoch_indices(n, 0, seed=7, process_index=1, process_count=pc)
    np.testing.assert_array_equal(shards[1], again)
    other = process_epoch_indices(n, 1, seed=7, process_index=1, process_count=pc)
    assert not np.array_equal(shards[1], other)


def test_coordinator_and_sync_flag_single_process():
    from videoyolo_tpu.parallel.multihost import is_coordinator, sync_flag

    assert is_coordinator() is True  # single process is its own coordinator
    assert sync_flag(True) is True  # identity, no collective
    assert sync_flag(False) is False


def test_put_global_batch_shards_over_mesh():
    import jax

    from videoyolo_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    batch = {"image": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    out = put_global_batch(batch, mesh)
    arr = out["image"]
    assert arr.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(arr), batch["image"])
    # batch axis really sharded over "data"
    assert len(arr.sharding.device_set) == 8
    shard = arr.addressable_shards[0]
    assert shard.data.shape == (1, 4)


def test_loader_sampler_and_len_override():
    from videoyolo_tpu.data.loader import DetectionLoader
    from tests.test_loader import FakeDataset, SizeTransform

    ds = FakeDataset(n=40)
    order = {0: np.arange(8), 1: np.arange(8)[::-1]}
    loader = DetectionLoader(
        ds, batch_size=4, num_workers=1, last_batch="discard",
        transform_factory=SizeTransform, shape_sizes=[32],
        sampler=lambda e: order[e], num_samples=8,
    )
    assert len(loader) == 2  # 8 samples / batch 4, not 40
    # identify sample order by the label class column (idx % 3)
    ids0 = np.concatenate([b["label"][:, 0, 4] for b in loader])
    e1 = list(loader)
    ids1 = np.concatenate([b["label"][:, 0, 4] for b in e1])
    np.testing.assert_array_equal(ids0, np.arange(8) % 3)
    np.testing.assert_array_equal(ids1, np.arange(8)[::-1] % 3)


def test_true_two_process_assembly():
    """The REAL multi-process branch (multihost.py: make_array_from_
    process_local_data): two jax.distributed-initialised CPU processes
    assemble global batches in lockstep over a 2x2-device mesh and verify
    per-epoch coverage through jitted global sums.  Single-process tests
    cannot reach this branch — this one fails if it breaks."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    # the axon TPU plugin registers from sitecustomize at interpreter start
    # (before the worker's own env mutations run) — strip its trigger here
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} DONE" in out, out
        assert f"proc{i} epoch0 OK" in out and f"proc{i} epoch1 OK" in out, out
        assert f"proc{i} syncflag OK" in out, out
