from codeps_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,
                                      shard_batch, shard_batch_multihost)

__all__ = ["make_mesh", "replicate", "shard_batch",
           "shard_batch_multihost", "batch_sharding"]
