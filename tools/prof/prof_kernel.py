"""Standalone timing: Pallas fused_packed_pair vs XLA packed chain."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.ops.pallas_kernels import (
    fused_packed_pair, packed_pair_reference, pick_band)

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)
rs = np.random.RandomState(0)


def timeit(fn, args, iters=20, warmup=3, label=""):
    # In-graph chained scan: ONE dispatch runs `iters` sequential executions
    # with a data dependency (mean of out feeds the next input), which defeats
    # both dispatch-latency noise and the axon tunnel's apparent caching of
    # repeated dispatches (which otherwise reads ~0.03 ms).
    rest = args[1:]

    @jax.jit
    def chained(x0):
        def body(c, _):
            out = fn(c, *rest)
            c2 = c + (jnp.mean(out) * 1e-12).astype(c.dtype)
            return c2, ()
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return c

    t0 = time.time(); out = chained(args[0]); jax.block_until_ready(out)
    c = time.time() - t0
    out = chained(args[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(args[0]); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:48s} {dt:8.2f} ms   (compile {c:.0f}s)", file=sys.stderr)
    return fn(*args), dt


def stage_args(h, c1, c4, dtype):
    a = [
        rs.randn(1, h, h, c1), rs.randn(1, h, h, 4) * 0.1,
        rs.randn(1, h, h, 4) * 0.1,
        rs.randn(3, 3, c1, c4) * 0.05, rs.rand(1, c1) + 0.5,
        rs.rand(1, c4) + 0.5, rs.randn(c4) * 0.1,
        rs.randn(3, 3, c4, c4) * 0.05, rs.rand(1, c4) + 0.5,
        rs.rand(1, c4) + 0.5, rs.randn(c4) * 0.1,
    ]
    out = []
    for i, v in enumerate(a):
        dt = dtype if i in (0, 3, 7) else jnp.float32
        out.append(jax.device_put(jnp.asarray(v.astype(np.float32), dt), tpu))
    return out


for h, c1, c4, label in ((512, 64, 128, "1024px-stage"),
                         (256, 128, 256, "512px-stage")):
    a = stage_args(h, c1, c4, jnp.bfloat16)
    bands = (pick_band(h, h, c1, c4), pick_band(h, h, c4, c4))
    f_pl = jax.jit(fused_packed_pair)
    f_xla = jax.jit(packed_pair_reference)
    o1, _ = timeit(f_pl, a, label=f"{label} pallas bands={bands} bf16")
    o2, _ = timeit(f_xla, a, label=f"{label} xla-packed bf16")
    d = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"{label} max|diff| = {d:.4f}", file=sys.stderr)
