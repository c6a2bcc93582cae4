from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   initialize_distributed, shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "initialize_distributed", "shard_batch"]
