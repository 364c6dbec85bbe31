"""Standalone batch scaling of the full AlignNet body0 region (algebraic
formulation): if THIS batches well, the pipeline context (fusion across
SAMM/decode boundaries) causes the batch collapse; if badly, the IN+conv
fused region itself is to blame. In-graph scan chaining."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from ood_gan_inversion_tpu.ops.pallas_kernels import (
    algebraic_alignnet_body0, alignnet_body0_reference)

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)

DT = jnp.float32  # the fp32 island dtype
N_CHAIN = 10


def bench(label, fn, *args):
    def body(carry, _):
        out = fn(carry, *args[1:])
        return carry + jnp.mean(out)[None, None, None, None] * 1e-12, ()

    def run(x):
        y, _ = lax.scan(body, x, None, length=N_CHAIN)
        return y

    r = jax.jit(run)
    t0 = time.time()
    jax.block_until_ready(r(args[0])); comp = time.time() - t0
    jax.block_until_ready(r(args[0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(r(args[0]))
        best = min(best, (time.perf_counter() - t0) / N_CHAIN)
    b = args[0].shape[0]
    print(f"{label:44s} {best*1000:8.3f} ms/op  {best*1000/b:7.3f} ms/img "
          f"(compile {comp:.0f}s)", file=sys.stderr)


MODE = os.environ.get("MODE", "algebraic")
op = (algebraic_alignnet_body0 if MODE == "algebraic"
      else alignnet_body0_reference)

for h, c in ((128, 256), (256, 128)):
    c2 = 2 * c
    rs = np.random.RandomState(0)
    g1 = jnp.asarray(rs.rand(c2) + 0.5, DT)
    b1 = jnp.asarray(0.2 * rs.randn(c2), DT)
    k1 = jnp.asarray(rs.randn(3, 3, c2, c2) * 0.05, DT)
    al = jnp.asarray(rs.rand(c2) * 0.5, DT)
    k2 = jnp.asarray(rs.randn(3, 3, c2, c2) * 0.05, DT)
    g2 = jnp.asarray(rs.rand(c2) + 0.5, DT)
    b2 = jnp.asarray(0.2 * rs.randn(c2), DT)
    for b in (1, 4, 8):
        s = jax.device_put(jnp.asarray(rs.randn(b, h, h, c) * 0.5, DT), tpu)
        t = jax.device_put(jnp.asarray(rs.randn(b, h, h, c) * 0.5, DT), tpu)
        bench(f"{MODE} body0 {h}px 2C={c2} b={b}",
              lambda sv, tv: op(sv, tv, g1, b1, k1, al, k2, g2, b2),
              s, t)
