"""Spatial partitioning (SP) of the high-res decode over a device mesh.

The reference has no single-image scale-out at all (its DDP is pure
data-parallel, BasicSR dist_util.py:10-82); on TPU the idiomatic way to cut
single-image 1024px latency is GSPMD spatial partitioning: annotate the
decode-tail activations as sharded along H over an 'sp' mesh axis and let
XLA's SPMD partitioner split every conv/elementwise op and insert the
halo exchanges over ICI itself (the scaling-book recipe: pick a mesh,
annotate, let the compiler place collectives).

Usage:
    mesh = make_mesh(devices, axes=("sp",))
    with spatial_sharding(mesh, min_h=512):
        out = jax.jit(fwd)(params, x)   # trace happens inside the context

`constrain(x)` is a no-op outside the context (zero cost for the default
single-chip path) and inside it only touches NHWC tensors whose H is
divisible by the axis size — coarse stages and style vectors pass through
untouched, so SAMM's instance norms and bounded warps stay unsharded while
the >=512px stages (the FLOP/bandwidth tail) split n_sp ways.
"""

import contextlib
import threading

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_CTX = threading.local()


@contextlib.contextmanager
def spatial_sharding(mesh, axis: str = "sp", min_h: int = 512):
    """Activate SP constraints for traces happening inside the block."""
    n = mesh.shape[axis]
    prev = getattr(_CTX, "state", None)
    _CTX.state = (mesh, axis, int(min_h), int(n))
    try:
        yield
    finally:
        _CTX.state = prev


def active() -> bool:
    return getattr(_CTX, "state", None) is not None


def constrain(x):
    """Pin a decode activation to H-sharded layout when SP is active.

    Accepts NHWC (B, H, W, C); anything else (or H < min_h, or H not
    divisible by the axis size) is returned unchanged."""
    state = getattr(_CTX, "state", None)
    if state is None or not hasattr(x, "ndim") or x.ndim != 4:
        return x
    mesh, axis, min_h, n = state
    h = x.shape[1]
    if h < min_h or h % n != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, axis, None, None)))
