"""Standalone compile/parity/speed probe of the whole-stage Pallas kernel
(ops/pallas_kernels.py:fused_packed_stage) at the REAL packed-tail shapes
of the 1024px generator (from an eval_shape trace of the flagship arch):

    512-out stage:  h=w=256, c1=128, c4=256   (bf16)
    1024-out stage: h=w=512, c1=64,  c4=128   (bf16)

The r2 note "18.65 MB scoped VMEM > 16 MB limit" was measured before the
band estimator learned to pick band 4; this probe asks the real compiler
whether each (shape, band) lowers, what it allocates when it doesn't, and
how the kernel times against the XLA packed-chain reference standalone.

BANDS env (default "4,8"), B env batches (default "1,8").
"""
import functools
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.ops import pallas_kernels as pk

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)

SHAPES = [(256, 128, 256), (512, 64, 128)]       # (h=w, c1, c4)
BANDS = [int(v) for v in os.environ.get("BANDS", "4,8").split(",")]
BATCHES = [int(v) for v in os.environ.get("B", "1,8").split(",")]
DT = jnp.bfloat16


def make_args(b, h, c1, c4, seed=0):
    rs = np.random.RandomState(seed)
    r = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * 0.1)
    return dict(
        x=r(b, h, h, c1).astype(DT), n1=r(b, h, h, 4), n2=r(b, h, h, 4),
        skip=r(b, h, h, 3).astype(DT),
        k1=r(3, 3, c1, c4).astype(DT), s1=r(b, c1), d1=r(b, c4),
        b1=r(c4), k2=r(3, 3, c4, c4).astype(DT), s2=r(b, c4), d2=r(b, c4),
        b2=r(c4), k3sr=r(b, c4, 12).astype(DT), b3=r(12),
        k4=r(3, 3, 3, 12).astype(DT))


def bench(fn, a, n=32):
    args = [a[k] for k in ("x", "n1", "n2", "skip", "k1", "s1", "d1", "b1",
                           "k2", "s2", "d2", "b2", "k3sr", "b3", "k4")]
    args = jax.device_put(args, tpu)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1000, comp, out


for h, c1, c4 in SHAPES:
    for b in BATCHES:
        a = make_args(b, h, c1, c4)
        ref_fn = jax.jit(pk.packed_stage_reference)
        ms_ref, comp_ref, ref = bench(ref_fn, a)
        print(f"h={h} c1={c1} c4={c4} b={b}  XLA ref {ms_ref:7.2f} ms "
              f"(compile {comp_ref:.0f}s)", file=sys.stderr)
        for band in BANDS:
            if h % band:
                continue
            try:
                fn = jax.jit(functools.partial(
                    pk.fused_packed_stage_pallas, band=band))

                def run(x, n1, n2, skip, k1, s1, d1, b1, k2, s2, d2, b2,
                        k3sr, b3, k4, _fn=fn, _b=b):
                    return _fn(x, n1, n2, skip, k1, s1, d1,
                               jnp.broadcast_to(b1[None], (_b, b1.shape[0])),
                               k2, s2, d2,
                               jnp.broadcast_to(b2[None], (_b, b2.shape[0])),
                               k3sr, jnp.broadcast_to(b3[None], (_b, 12)), k4)

                ms, comp, out = bench(jax.jit(run), a)
                d_rgb = float(jnp.max(jnp.abs(
                    out[0].astype(jnp.float32) - ref[0].astype(jnp.float32))))
                d_z2 = float(jnp.max(jnp.abs(
                    out[1].astype(jnp.float32) - ref[1].astype(jnp.float32))))
                print(f"  band={band:2d}  kernel {ms:7.2f} ms "
                      f"({ms_ref / ms:4.2f}x, compile {comp:.0f}s)  "
                      f"max|diff| rgb {d_rgb:.4f} z2 {d_z2:.4f}",
                      file=sys.stderr)
            except Exception as e:
                msg = str(e).splitlines()[0][:160]
                print(f"  band={band:2d}  FAILED: {type(e).__name__}: {msg}",
                      file=sys.stderr)
