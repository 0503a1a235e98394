from alignq_tpu.dist.mesh import make_mesh
from alignq_tpu.dist.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_batch",
]
