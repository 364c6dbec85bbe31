from .mesh import make_mesh, replicate_sharding, batch_sharding, shard_batch
