"""Is the in-graph scan-chain protocol itself inflating per-op times?
Time a trivial elementwise op and a big conv at iters=10 vs iters=40: a real
per-op cost scales linearly; a protocol artifact shows up as a large
intercept or a flat per-iter floor."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
rs = np.random.RandomState(0)


def chain(fn, x0, iters):
    @jax.jit
    def chained(x):
        def body(c, _):
            out = fn(c)
            return c + (jnp.mean(out) * 1e-12).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c
    out = chained(x0); jax.block_until_ready(out)   # compile
    out = chained(x0); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(x0); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1000


h = jax.device_put(jnp.asarray(rs.randn(1, 256, 256, 256), jnp.float32), tpu)
w = jax.device_put(jnp.asarray(rs.randn(3, 3, 256, 256) * 0.02, jnp.float32), tpu)

conv = lambda x: jax.lax.conv_general_dilated(
    x, w, (1, 1), ((1, 1), (1, 1)),
    dimension_numbers=("NHWC", "HWIO", "NHWC"))
triv = lambda x: x * 1.0001 + 0.0001

for label, fn in (("trivial elementwise", triv), ("conv3x3 256px 256ch", conv)):
    t10 = chain(fn, h, 10)
    t40 = chain(fn, h, 40)
    slope = (t40 - t10) / 30
    intercept = t10 - slope * 10
    print(f"{label:24s} iters10 {t10:7.2f} ms  iters40 {t40:7.2f} ms  "
          f"-> {slope:6.3f} ms/op + {intercept:5.2f} ms fixed", file=sys.stderr)
