from alignq_tpu.dist import multihost
from alignq_tpu.dist.mesh import make_mesh
from alignq_tpu.dist.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "multihost",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_batch",
]
