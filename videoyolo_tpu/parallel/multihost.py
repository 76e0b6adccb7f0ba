"""Multi-host data sharding: per-process loaders feeding one global array.

The reference is single-node (SURVEY.md §2.10 — no horovod/dist kvstore);
this module is the TPU-pod extension of its DataLoader machinery: each host
process decodes ONLY the samples destined for its addressable chips, and
`jax.make_array_from_process_local_data` assembles the logically-global
batch the pjit train step consumes.  DCN never carries pixels — every
host->device transfer is local, and the gradient all-reduce is the only
cross-host traffic (inserted by XLA from the shardings, parallel/mesh.py).

Single-process runs degrade to exactly the existing `shard_batch` behavior,
so the train CLI can call `put_global_batch` unconditionally.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "local_batch_size",
    "process_epoch_indices",
    "put_global_batch",
    "is_coordinator",
    "sync_flag",
    "sync_any",
]


def is_coordinator() -> bool:
    """True on exactly one process per job (process_index 0).

    Host-side artifacts — checkpoints, `_best_map.log`, TensorBoard events,
    the `_train.log` file handler — must be written by ONE process: on a
    pod-shared filesystem concurrent writers corrupt each other, and even on
    process-local disks the duplicated work is pure waste.  The reference is
    single-process so it never needed this guard (train_yolov3.py:289-309
    writes unconditionally)."""
    return jax.process_index() == 0


def sync_flag(value: bool) -> bool:
    """All processes agree on the COORDINATOR's boolean.

    For host-clock-derived control flow (e.g. the train CLI's
    `--max_epoch_time` epoch cutoff): each process's wall clock crosses the
    threshold at a different batch index, and a process that stops issuing
    the pjit step while its peers continue deadlocks the job inside a GSPMD
    collective.  This is itself a collective — every process must call it at
    the SAME point in its step sequence (the train CLI checks only on
    log-interval boundaries, which the lockstep batch schedule guarantees).

    Single-process: identity, no device traffic.
    """
    if jax.process_count() == 1:
        return bool(value)
    from jax.experimental import multihost_utils

    return bool(multihost_utils.broadcast_one_to_all(np.asarray(bool(value))))


def sync_any(value: bool) -> bool:
    """True everywhere iff ANY process passed True.

    For signals that can land on any subset of hosts (preemption SIGTERM):
    unlike `sync_flag`, a non-coordinator's True must also stop the job.
    Same collective call-site discipline as `sync_flag`.  Single-process:
    identity."""
    if jax.process_count() == 1:
        return bool(value)
    from jax.experimental import multihost_utils

    return bool(multihost_utils.process_allgather(np.asarray(bool(value))).any())


def local_batch_size(global_batch_size: int, process_count: Optional[int] = None) -> int:
    """Samples THIS process must produce per step."""
    pc = process_count if process_count is not None else jax.process_count()
    assert global_batch_size % pc == 0, (
        f"global batch {global_batch_size} not divisible by {pc} processes"
    )
    return global_batch_size // pc


def process_epoch_indices(
    n_samples: int,
    epoch: int,
    seed: int = 0,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    drop_remainder: bool = True,
) -> np.ndarray:
    """This process's dataset indices for `epoch`.

    Every process derives the SAME seeded permutation (seed + epoch), then
    takes its contiguous block — a pure function of (pid, pcount), so no
    coordination traffic is needed and coverage/disjointness hold by
    construction.  With drop_remainder the tail that doesn't divide evenly
    is dropped (the reference's last_batch='discard').
    """
    pid = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    rng = np.random.RandomState(seed + epoch)
    perm = rng.permutation(n_samples)
    if drop_remainder:
        perm = perm[: (n_samples // pc) * pc]
    return perm[pid::pc] if not drop_remainder else perm[
        pid * (len(perm) // pc) : (pid + 1) * (len(perm) // pc)
    ]


def put_global_batch(batch, mesh: Mesh, axis: str = "data"):
    """Per-process local batch pytree -> globally-sharded device arrays.

    Each leaf's leading axis holds this process's local_batch_size samples;
    the returned arrays are logically global with the batch axis sharded
    over `axis`.  Single-process: equivalent to mesh.shard_batch.
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)
