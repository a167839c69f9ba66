from maskflownet_tpu.parallel.mesh import (batch_sharding,
                                           initialize_distributed, make_mesh,
                                           replicated_sharding, shard_batch)

__all__ = ["batch_sharding", "initialize_distributed", "make_mesh",
           "replicated_sharding", "shard_batch"]
