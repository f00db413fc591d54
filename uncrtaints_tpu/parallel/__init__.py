from uncrtaints_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
    maybe_init_distributed,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "maybe_init_distributed"]
