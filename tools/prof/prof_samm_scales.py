"""Per-scale SPMWarp cost, fp32 vs bf16, plus intra-bottleneck component
breakdown. Locates where the bf16 SAMM regression (PERF.md) comes from.
In-graph scan chaining per the axon timing protocol."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.nn.samm import SPMWarp, AlignNet, _XavierBottleneckIR
from ood_gan_inversion_tpu.nn.layers import InstanceNorm2d

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)
rs = np.random.RandomState(0)


def timeit_chain(fn, x0, iters=10, label=""):
    @jax.jit
    def chained(x):
        def body(c, _):
            out = fn(c)
            leaves = [jnp.mean(l) for l in jax.tree_util.tree_leaves(out)]
            return c + (sum(leaves) * 1e-12).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c
    t0 = time.time(); out = chained(x0); jax.block_until_ready(out)
    comp = time.time() - t0
    out = chained(x0); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(x0); jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    print(f"{label:52s} {best:8.3f} ms (compile {comp:.0f}s)", file=sys.stderr)
    return best


# the 4 SAMM scales of the 1024px cm=2 config: (res, gen-channels)
SCALES = [(32, 512), (64, 512), (128, 256), (256, 128)]
B = int(os.environ.get("B", "1"))

tot = {"fp32": 0.0, "bf16": 0.0}
for res, C in SCALES:
    for dtname, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        src = jax.device_put(jnp.asarray(rs.randn(B, res, res, C), dt), tpu)
        tgt = jax.device_put(jnp.asarray(rs.randn(B, res, res, C), dt), tpu)
        warp = SPMWarp(C, scale=0.08, cycle_align=2)
        with jax.default_device(cpu):
            vs = warp.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, C), dt),
                           jnp.zeros((1, res, res, C), dt))
        params = jax.device_put(vs["params"], tpu)
        t = timeit_chain(lambda s: warp.apply({"params": params}, s, tgt)[0],
                         src, label=f"SPMWarp {res}px C={C} {dtname} b={B}")
        tot[dtname] += t
print(f"TOTAL fp32 {tot['fp32']:.2f} ms   bf16 {tot['bf16']:.2f} ms",
      file=sys.stderr)

# component breakdown at the two scales that matter (64px deep, 256px wide)
for res, C in [(64, 512), (256, 128)]:
    C2 = 2 * C
    for dtname, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        h = jax.device_put(jnp.asarray(rs.randn(B, res, res, C2), dt), tpu)

        btn = _XavierBottleneckIR(C2, C2)
        with jax.default_device(cpu):
            vs = btn.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, C2), dt))
        p = jax.device_put(vs["params"], tpu)
        timeit_chain(lambda x: btn.apply({"params": p}, x), h,
                     label=f"  bottleneck {res}px 2C={C2} {dtname}")

        innorm = InstanceNorm2d(C2, affine=True)
        with jax.default_device(cpu):
            vs = innorm.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, C2), dt))
        p2 = jax.device_put(vs["params"], tpu)
        timeit_chain(lambda x: innorm.apply({"params": p2}, x), h,
                     label=f"  IN(affine) {res}px 2C={C2} {dtname}")

        w = jax.device_put(jnp.asarray(
            rs.randn(3, 3, C2, C2) * 0.02, dt), tpu)
        conv = lambda x: jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        timeit_chain(conv, h, label=f"  conv3x3 {res}px 2C={C2} {dtname}")
