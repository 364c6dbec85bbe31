from .mesh import make_mesh, replicate_sharding, batch_sharding, shard_batch
from .spatial import spatial_sharding, constrain as spatial_constrain
