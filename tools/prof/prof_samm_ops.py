"""Isolate SAMM component costs fp32 vs bf16 at the 256px scale
(in-graph scan chaining)."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.nn.samm import AlignNet, SPMWarp
from ood_gan_inversion_tpu.ops.upfirdn2d import make_kernel, blur as fir_blur
from ood_gan_inversion_tpu.ops.grid_sample import grid_sample_bilinear

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)
rs = np.random.RandomState(0)
BLUR = make_kernel((1, 3, 3, 1))


def timeit_chain(fn, x0, iters=10, label=""):
    @jax.jit
    def chained(x):
        def body(c, _):
            out = fn(c)
            return c + (jnp.mean(out) * 1e-12).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c
    t0 = time.time(); out = chained(x0); jax.block_until_ready(out)
    comp = time.time() - t0
    out = chained(x0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(x0); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:44s} {dt:8.2f} ms (compile {comp:.0f}s)", file=sys.stderr)


C = 128  # generator channels at 256px
src_h = rs.randn(1, 256, 256, C).astype(np.float32)
tgt_h = rs.randn(1, 256, 256, C).astype(np.float32)
grid_h = np.stack(np.meshgrid(np.linspace(-1, 1, 256), np.linspace(-1, 1, 256)),
                  -1)[None].astype(np.float32)

for dtname, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
    src = jax.device_put(jnp.asarray(src_h, dt), tpu)
    tgt = jax.device_put(jnp.asarray(tgt_h, dt), tpu)
    grid = jax.device_put(jnp.asarray(grid_h, dt), tpu)

    # full SPMWarp cycle-2 (the whole per-scale SAMM cost)
    warp = SPMWarp(C, scale=0.08, cycle_align=2)
    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        params = warp.init(rng, jnp.zeros((1, 256, 256, C)),
                           jnp.zeros((1, 256, 256, C)))
    params = jax.device_put(params, tpu)
    timeit_chain(lambda s: warp.apply(params, s, tgt)[0], src,
                 label=f"SPMWarp 256px cycle2 {dtname}")

    # AlignNet alone
    an = AlignNet(C, scale=0.08)
    with jax.default_device(cpu):
        ap = an.init(rng, jnp.zeros((1, 256, 256, C)),
                     jnp.zeros((1, 256, 256, C)))
    ap = jax.device_put(ap, tpu)
    timeit_chain(lambda s: an.apply(ap, s, tgt), src,
                 label=f"AlignNet 256px {dtname}")

    # grid_sample
    timeit_chain(lambda s: grid_sample_bilinear(s, grid), src,
                 label=f"grid_sample 256px x{C} {dtname}")

    # blur on 3ch align maps
    a3 = jax.device_put(jnp.asarray(rs.randn(1, 256, 256, 3), dt), tpu)
    timeit_chain(lambda s: fir_blur(s, jnp.asarray(BLUR, dt), pad=(2, 1)), a3,
                 label=f"fir_blur 256px x3 {dtname}")
