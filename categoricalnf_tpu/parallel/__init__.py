from categoricalnf_tpu.parallel.mesh import (DATA_AXIS, SAMPLE_AXIS,
                                             batch_sharding, create_mesh,
                                             maybe_init_distributed,
                                             replicated,
                                             sample_batch_sharding,
                                             shard_batch)

__all__ = ["DATA_AXIS", "SAMPLE_AXIS", "batch_sharding", "create_mesh",
           "maybe_init_distributed", "replicated", "sample_batch_sharding",
           "shard_batch"]
