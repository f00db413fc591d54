from uncrtaints_tpu.parallel.mesh import (
    make_mesh, make_mesh_2d, batch_sharding, spatial_sharding,
    replicated_sharding, shard_batch, maybe_init_distributed,
)

__all__ = ["make_mesh", "make_mesh_2d", "batch_sharding", "spatial_sharding",
           "replicated_sharding", "shard_batch", "maybe_init_distributed"]
