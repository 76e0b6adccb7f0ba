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

__all__ = [
    "make_mesh",
    "make_2d_mesh",
    "assert_spatial_safe",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]


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


def shard_batch(
    batch,
    mesh: Mesh,
    axis: str = "data",
    spatial_axis: str = "space",
    spatial_keys: Sequence[str] = ("image",),
):
    """Device-put a host batch pytree with the leading axis sharded over the
    mesh — the TPU-native `split_and_load`.

    If the mesh has a `spatial_axis` of size > 1, the `spatial_keys` entries
    (NHWC image tensors) are additionally sharded along H, so convolutions
    run spatially partitioned (GSPMD inserts the halo exchanges) — the TPU
    recipe for scaling a single high-resolution image across chips, which
    the reference's per-GPU data split (train_yolov3.py:596-606) cannot
    express at all.  Non-image keys (gt boxes/ids, indices) stay batch-
    sharded only.
    """
    data = NamedSharding(mesh, P(axis))
    spatial_on = spatial_axis in mesh.axis_names and mesh.shape[spatial_axis] > 1

    def _spatial(x):
        # shard H, which sits at ndim-3 in channels-last layouts: dim 1 for
        # (B,H,W,C) frames, dim 2 for temporal (B,K,H,W,C) windows — never
        # the window axis K
        if not spatial_on or x.ndim < 4:
            return data
        spec = [None] * x.ndim
        spec[0] = axis
        spec[x.ndim - 3] = spatial_axis
        return NamedSharding(mesh, P(*spec))

    if isinstance(batch, dict):
        return {
            k: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, _spatial(x) if k in spatial_keys else data),
                v,
            )
            for k, v in batch.items()
        }
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, data), batch)


def make_2d_mesh(n_devices: Optional[int] = None, spatial: int = 1) -> Mesh:
    """("data", "space") mesh with `spatial`-way spatial partitioning; the
    remaining factor is data parallelism.  spatial=1 degrades to pure dp."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    assert n % spatial == 0, f"{spatial}-way spatial shard over {n} devices"
    return make_mesh(n, axis_names=("data", "space"), shape=(n // spatial, spatial))


def assert_spatial_safe(hw, spatial: int, max_stride: int = 32, window: int = 3) -> None:
    """Guard the dp×sp regime: the deepest feature map (H / max_stride) must
    still FIT the conv window when the H axis is sharded.

    Measured on jax 0.9.0's CPU SPMD backend (8-device virtual mesh,
    tests/test_spatial.py's model): with BOTH batch and H sharded and a 3x3
    SAME conv whose window exceeds the global sharded dim (64px input ->
    H/32 = 2 < 3), the partitioner emits a wrong collective and the deepest
    route comes back scaled by EXACTLY the dp axis size (x2 at dp=2, x4 at
    dp=4; space-only sharding is exact, 96px/H32=3 and 128px/H32=4 are
    exact).  Real detection shards >=416px images (H/32 = 13), far inside
    the safe envelope — this assert just keeps the degenerate case
    unreachable rather than silently wrong.
    """
    h = hw if isinstance(hw, int) else hw[0]
    assert spatial == 1 or h // max_stride >= window, (
        f"spatial sharding needs the deepest feature map (input {h} / stride "
        f"{max_stride} = {h // max_stride}) to fit a {window}-tap conv window; "
        f"use input >= {window * max_stride} or spatial=1 (see "
        "parallel/mesh.assert_spatial_safe)"
    )
