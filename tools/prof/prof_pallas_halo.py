"""Verify pl.Element halo semantics in interpret mode (CPU)."""
import os, sys
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_platforms", "cpu")

T, H = 8, 1  # tile, halo
N = 32

def kernel(x_ref, o_ref):
    x = x_ref[:]  # (T+2H, T+2H)
    acc = jnp.zeros((T, T), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + x[dy:dy+T, dx:dx+T]
    o_ref[:] = acc

def run(x):
    return pl.pallas_call(
        kernel,
        grid=(N // T, N // T),
        in_specs=[pl.BlockSpec(
            (pl.Element(T + 2*H, padding=(H, H)), pl.Element(T + 2*H, padding=(H, H))),
            lambda i, j: (i * T - H, j * T - H))],
        out_specs=pl.BlockSpec((T, T), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        interpret=True,
    )(x)

x = jnp.asarray(np.random.RandomState(0).randn(N, N).astype(np.float32))
got = run(x)
ref = jax.lax.conv_general_dilated(
    x[None, :, :, None], jnp.ones((3, 3, 1, 1), jnp.float32), (1, 1),
    ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
print("match:", np.allclose(got, ref, atol=1e-5))
