"""Tensor-parallel (channel-sharded) serving over a device mesh.

The reference's only parallelism is data parallel (per-GPU batch split,
train_yolov3.py:596-606); a latency-bound serving deployment wants the
OPPOSITE split — one request's compute spread across chips.  On TPU the
native form is channel sharding under GSPMD: annotate every conv kernel's
output-channel dim (and each channel-indexed vector: BN scale/bias/stats,
conv bias, int8 wscale) with a "model" mesh axis and let the SPMD
partitioner propagate activation shardings and insert the collectives over
ICI.  No model code changes — the same flax apply runs replicated,
data-parallel, spatially partitioned, or tensor-parallel purely through
`jax.device_put` placement of the variables.

Layout rule (weight-stationary): a leaf with ndim >= 3 is a conv kernel
(2D (kh,kw,cin,cout), 3D, or 2+1D — out-channels last in every case, see
models/layers.py); ndim == 1 is a channel vector.  A dim is only sharded
when divisible by the mesh axis size — no GSPMD padded-uneven paths.
Kernels whose out-channel count does not divide (the YOLO head's
3*(5+C)-channel prediction convs) shard on their INPUT-channel dim
instead: the tip activations feeding them are already channel-sharded by
the preceding rule, so the contraction stays fully local and GSPMD closes
the level with one psum over the small (A*(5+C),) output — instead of
all-gathering the widest head activations to feed a replicated conv.
Odd-sized vectors (those convs' biases) replicate.  int8
`qkernel`/`wscale` follow the same rules, so the quantized serving path
tensor-parallelizes identically.

Correctness is locked on the virtual 8-device CPU mesh
(tests/test_spatial.py): tp outputs bit-match the replicated apply.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_shardings", "shard_variables_tp"]


def tp_shardings(variables, mesh: Mesh, axis: str = "model"):
    """Pytree of NamedShardings mirroring `variables`: conv kernels sharded
    on their last (out-channel) dim — falling back to the input-channel dim
    (reduce-parallel) when out-channels don't divide — channel vectors on
    dim 0, everything else (scalars, embeddings, non-divisible dims)
    replicated."""
    size = mesh.shape[axis]

    def rule(x):
        if x.ndim >= 3:
            if x.shape[-1] % size == 0:
                return NamedSharding(mesh, P(*((None,) * (x.ndim - 1) + (axis,))))
            if x.shape[-2] % size == 0:
                return NamedSharding(
                    mesh, P(*((None,) * (x.ndim - 2) + (axis, None)))
                )
        if x.ndim == 1 and x.shape[0] % size == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, variables)


def shard_variables_tp(variables, mesh: Mesh, axis: str = "model"):
    """device_put `variables` with `tp_shardings` — the one-call entry:

        mesh = make_mesh(8, axis_names=("model",))
        variables = shard_variables_tp(variables, mesh)
        step = jax.jit(lambda im: postprocess(*model.apply(variables, im)))

    The jitted step then runs tensor-parallel with replicated inputs and
    outputs; XLA chooses the per-conv collectives.
    """
    return jax.device_put(variables, tp_shardings(variables, mesh, axis))
