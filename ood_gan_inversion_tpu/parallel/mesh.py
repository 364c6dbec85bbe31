"""Device mesh + sharding helpers.

Replaces the reference's entire distributed layer (NCCL DDP wrap
BasicSR/basicsr/models/base_model.py:87-101, EnlargedSampler rank striding
data_sampler.py:29-42, loss-dict dist.reduce base_model.py:355-380): here a
single jitted train step annotated with NamedShardings over a
jax.sharding.Mesh makes XLA insert the gradient all-reduce over ICI; the
loss scalars come back already averaged because they are computed from
replicated params and sharded data inside the same program.

Default topology: 1-D 'data' mesh (the reference is pure data-parallel).
The helpers accept any axis layout so a ('data','model') mesh drops in when
channel-sharding the 1024px stages becomes worthwhile.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axes=("data",), shape=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axes)


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in `batch` with its leading dim sharded over `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
