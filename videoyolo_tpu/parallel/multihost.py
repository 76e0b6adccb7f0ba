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
]


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
