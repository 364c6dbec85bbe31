"""Per-scale SPMWarp + component costs via the SLOPE protocol: time chained
scans at iters=10 and iters=40 and report (t40-t10)/30 — the chain call
carries a ~26 ms fixed overhead on the axon tunnel (prof_chain_sanity.py)
that inflated the naive per-iter numbers ~5x."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.nn.samm import SPMWarp, _XavierBottleneckIR
from ood_gan_inversion_tpu.nn.layers import InstanceNorm2d

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)
rs = np.random.RandomState(0)


def chain_time(fn, x0, iters):
    @jax.jit
    def chained(x):
        def body(c, _):
            out = fn(c)
            leaves = [jnp.mean(l) for l in jax.tree_util.tree_leaves(out)]
            return c + (sum(leaves) * 1e-12).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c
    out = chained(x0); jax.block_until_ready(out)
    out = chained(x0); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(x0); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def slope(fn, x0, label):
    t10 = chain_time(fn, x0, 10)
    t40 = chain_time(fn, x0, 40)
    per = (t40 - t10) / 30
    print(f"{label:46s} {per:8.3f} ms/op (fixed {t10 - per * 10:6.1f} ms)",
          file=sys.stderr)
    return per


SCALES = [(32, 512), (64, 512), (128, 256), (256, 128)]
B = int(os.environ.get("B", "1"))
ONLY = os.environ.get("ONLY", "")

tot = {}
for res, C in SCALES:
    if ONLY and str(res) not in ONLY.split(","):
        continue
    for dtname, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        src = jax.device_put(jnp.asarray(rs.randn(B, res, res, C), dt), tpu)
        tgt = jax.device_put(jnp.asarray(rs.randn(B, res, res, C), dt), tpu)
        warp = SPMWarp(C, scale=0.08, cycle_align=2)
        with jax.default_device(cpu):
            vs = warp.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, res, res, C), dt),
                           jnp.zeros((1, res, res, C), dt))
        params = jax.device_put(vs["params"], tpu)
        t = slope(lambda s: warp.apply({"params": params}, s, tgt),
                  src, f"SPMWarp {res}px C={C} {dtname} b={B}")
        tot[dtname] = tot.get(dtname, 0.0) + t
print("TOTAL", {k: round(v, 2) for k, v in tot.items()}, file=sys.stderr)

if os.environ.get("COMPONENTS", "1") == "1":
    for res, C in [(64, 512), (256, 128)]:
        C2 = 2 * C
        for dtname, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            h = jax.device_put(jnp.asarray(rs.randn(B, res, res, C2), dt), tpu)
            btn = _XavierBottleneckIR(C2, C2)
            with jax.default_device(cpu):
                vs = btn.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, res, res, C2), dt))
            p = jax.device_put(vs["params"], tpu)
            slope(lambda x: btn.apply({"params": p}, x), h,
                  f"  bottleneck {res}px 2C={C2} {dtname}")

            innorm = InstanceNorm2d(C2, affine=True)
            with jax.default_device(cpu):
                vs = innorm.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, res, res, C2), dt))
            p2 = jax.device_put(vs["params"], tpu)
            slope(lambda x: innorm.apply({"params": p2}, x), h,
                  f"  IN(affine) {res}px 2C={C2} {dtname}")

            w = jax.device_put(jnp.asarray(rs.randn(3, 3, C2, C2) * 0.02, dt),
                               tpu)
            conv = lambda x: jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            slope(conv, h, f"  conv3x3 {res}px 2C={C2} {dtname}")
