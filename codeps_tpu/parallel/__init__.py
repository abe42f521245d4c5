from codeps_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,
                                      shard_batch, shard_batch_multihost)
from codeps_tpu.parallel.spatial import (shard_adapt_batch_hybrid,
                                         shard_adapt_batch_spatial)

__all__ = ["make_mesh", "replicate", "shard_batch",
           "shard_batch_multihost", "batch_sharding",
           "shard_adapt_batch_spatial", "shard_adapt_batch_hybrid"]
