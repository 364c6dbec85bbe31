"""Sanity: is the isolated-stage harness actually executing on the TPU?"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0]), math
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)

rs = np.random.RandomState(0)
x = jax.device_put(jnp.asarray(rs.randn(1, 512, 512, 64).astype(np.float32)), tpu)
w1 = jax.device_put(jnp.asarray(rs.randn(3, 3, 64, 32).astype(np.float32)), tpu)
w2 = jax.device_put(jnp.asarray(rs.randn(3, 3, 32, 32).astype(np.float32)), tpu)

@jax.jit
def f(x, w1, w2):
    y = jax.lax.conv_general_dilated(x, w1, (1, 1), ((2, 2), (2, 2)),
                                     lhs_dilation=(2, 2),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.where(y >= 0, y, 0.2 * y)
    z = jax.lax.conv_general_dilated(y[:, :1024, :1024], w2, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return z

out = f(x, w1, w2)
jax.block_until_ready(out)
print("shape", out.shape, "mean", float(jnp.mean(out)), file=sys.stderr)

# per-call hard sync (np fetch)
t0 = time.perf_counter()
for i in range(5):
    out = f(x, w1, w2)
    _ = np.asarray(out[0, :2, :2, :2])
print(f"per-call fetch-sync: {(time.perf_counter()-t0)/5*1000:.2f} ms", file=sys.stderr)

# enqueue-20 block-once
for _ in range(3):
    out = f(x, w1, w2)
jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(20):
    out = f(x, w1, w2)
jax.block_until_ready(out)
print(f"enqueue-20: {(time.perf_counter()-t0)/20*1000:.2f} ms", file=sys.stderr)
