"""Device mesh + sharding helpers.

TPU-native replacement for the reference's single-process multi-GPU machinery
(`split_and_load` host->device scatter at train_yolov3.py:596-606, KVStore
'local' gradient aggregation at :527-530, SyncBatchNorm at :338,352):

  * one `jax.sharding.Mesh` over all chips, axis "data";
  * batches are sharded over "data" (sharded host->device transfer);
  * parameters/optimizer state are replicated; XLA inserts the gradient
    all-reduce (psum over ICI) automatically from the sharding annotations;
  * BatchNorm statistics are computed over the *global* batch because the
    batch axis is sharded — the syncbn behaviour, with the collective riding
    ICI for free.

The time/clip axis of video models is a second natural mesh axis ("time") for
`extract_base_features`-style sweeps (SURVEY.md §5); helpers below accept any
axis layout.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first `n_devices` devices (default: all).

    With the default single axis ("data",) this is pure data parallelism; pass
    e.g. axis_names=("data", "time"), shape=(4, 2) for clip-sharded sweeps.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data", ndim_extra: int = 0) -> NamedSharding:
    """Sharding that splits axis 0 (batch) over `axis`, replicating the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch pytree with the leading axis sharded over the
    mesh — the TPU-native `split_and_load`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
