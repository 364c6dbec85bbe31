"""Probe the batch>1 conv slowdown at SAMM body0 shapes: time a 3x3 conv
at b=1/4/8 directly vs with the batch FOLDED INTO H (each image padded by a
zero seam row so the conv is valid; seam outputs sliced away). In-graph
scan chaining (PERF.md protocol) to defeat dispatch caching."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)

DT = jnp.bfloat16
N_CHAIN = 20


def chain(fn, x):
    def body(carry, _):
        out = fn(carry)
        # feed a hair of the output back so XLA cannot parallelize/DCE
        return carry + jnp.mean(out) * 1e-12, ()
    def run(x):
        y, _ = lax.scan(body, x, None, length=N_CHAIN)
        return y
    return jax.jit(run)


def bench(label, fn, x):
    r = chain(fn, x)
    t0 = time.time()
    jax.block_until_ready(r(x)); comp = time.time() - t0
    jax.block_until_ready(r(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(r(x))
        best = min(best, (time.perf_counter() - t0) / N_CHAIN)
    print(f"{label:42s} {best*1000:8.3f} ms/op (compile {comp:.0f}s)",
          file=sys.stderr)
    return best


for h, c in ((128, 256), (256, 128)):
    c2 = 2 * c
    k = jnp.asarray(np.random.RandomState(0).randn(3, 3, c2, c2) * 0.05,
                    DT)

    def conv(v):
        return lax.conv_general_dilated(
            v, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_folded(v):
        b = v.shape[0]
        vp = jnp.pad(v, [(0, 0), (1, 1), (0, 0), (0, 0)])
        f = vp.reshape(1, b * (h + 2), h, c2)
        o = lax.conv_general_dilated(
            f, k, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        o = jnp.pad(o, [(0, 0), (0, 2), (0, 0), (0, 0)])
        return o.reshape(b, h + 2, h, c2)[:, :h]

    for b in (1, 4, 8):
        x = jax.device_put(jnp.asarray(
            np.random.RandomState(1).randn(b, h, h, c2) * 0.5, DT), tpu)
        ms_d = bench(f"conv3x3 {h}px 2C={c2} b={b} direct", conv, x)
        ms_f = bench(f"conv3x3 {h}px 2C={c2} b={b} folded", conv_folded, x)
        print(f"  -> per-img direct {ms_d*1000/b:7.3f}  folded "
              f"{ms_f*1000/b:7.3f}", file=sys.stderr)
