"""Device-mesh parallelism: sharding rules and the pjit train/eval steps."""

from .mesh import (  # noqa: F401
    make_mesh,
    make_2d_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from .tp import tp_shardings, shard_variables_tp  # noqa: F401
from .pp import PipelinedDetector, split_backbone_variables  # noqa: F401
