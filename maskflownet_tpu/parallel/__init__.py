from maskflownet_tpu.parallel.mesh import (DevicePrefetcher, batch_sharding,
                                           initialize_distributed, make_mesh,
                                           replicated_sharding, shard_batch)

__all__ = ["DevicePrefetcher", "batch_sharding", "initialize_distributed",
           "make_mesh", "replicated_sharding", "shard_batch"]
