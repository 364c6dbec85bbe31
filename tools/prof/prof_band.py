"""Band-size sweep for fused_conv3x3_act at both stage shapes."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.ops.pallas_kernels import fused_conv3x3_act

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)
rs = np.random.RandomState(0)


def timeit_chain(fn, args, iters=10, label=""):
    rest = args[1:]

    @jax.jit
    def chained(x0):
        def body(c, _):
            out = fn(c, *rest)
            return c + (jnp.mean(out) * 1e-12).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return c

    t0 = time.time(); out = chained(args[0]); jax.block_until_ready(out)
    comp = time.time() - t0
    out = chained(args[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(args[0]); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:44s} {dt:8.2f} ms  (compile {comp:.0f}s)", file=sys.stderr)


for h, ci, co, tag in ((512, 128, 128, "1024-conv2"), (512, 64, 128, "1024-conv1"),
                       (256, 256, 256, "512-conv2")):
    x = jax.device_put(jnp.asarray(rs.randn(1, h, h, ci).astype(np.float32),
                                   jnp.bfloat16), tpu)
    n = jax.device_put(jnp.asarray(rs.randn(1, h, h, 4).astype(np.float32)), tpu)
    k = jax.device_put(jnp.asarray((rs.randn(3, 3, ci, co) * 0.05).astype(np.float32),
                                   jnp.bfloat16), tpu)
    s = jax.device_put(jnp.asarray((rs.rand(1, ci) + 0.5).astype(np.float32)), tpu)
    d = jax.device_put(jnp.asarray((rs.rand(1, co) + 0.5).astype(np.float32)), tpu)
    bb = jax.device_put(jnp.asarray((rs.randn(1, co) * 0.1).astype(np.float32)), tpu)
    for band in (8, 16, 32):
        try:
            fn = lambda xx, nn, kk, ss, dd, bbb, bnd=band: fused_conv3x3_act(
                xx, nn, kk, ss, dd, bbb, bnd)
            timeit_chain(fn, (x, n, k, s, d, bb), label=f"{tag} band={band}")
        except Exception as ex:
            print(f"{tag} band={band}: {str(ex)[:120]}", file=sys.stderr)
