"""Device-mesh parallelism: sharding rules and the pjit train/eval steps."""

from .mesh import make_mesh, batch_sharding, replicated_sharding  # noqa: F401
