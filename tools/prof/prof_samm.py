"""Decompose full pipeline: encoder / SAMM-conditioned decode, fp32 vs bf16.
In-graph chained timing (axon tunnel caches repeated dispatches)."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)

BASE = {
    "type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
    "encoder": "E4E", "enable_modulation": True, "modulation_type": "NOISE",
    "warp_scale": 0.08, "cycle_align": 2, "blend_with_gen": True,
}
x_host = np.random.RandomState(0).randn(1, 1024, 1024, 3).astype(np.float32)


def timeit_chain(fn, x0, extra, iters=8, label=""):
    @jax.jit
    def chained(x):
        def body(c, i):
            out = fn(c, i, *extra)
            leaves = [jnp.mean(l) for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
            c2 = c + (sum(leaves) * 1e-12).astype(c.dtype)
            return c2, ()
        c, _ = jax.lax.scan(body, x, jnp.arange(iters), length=iters)
        return c

    t0 = time.time(); out = chained(x0); jax.block_until_ready(out)
    comp = time.time() - t0
    out = chained(x0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(x0); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:44s} {dt:8.2f} ms  (compile {comp:.0f}s)", file=sys.stderr)


for dtname, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
    net = build_network({**BASE, "dtype": dt})
    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        variables = net.init({"params": rng, "noise": rng},
                             jnp.zeros((1, 1024, 1024, 3)), mod_size=256)
    params = jax.device_put(variables["params"], tpu)
    x = jax.device_put(jnp.asarray(x_host), tpu)

    # encoder only
    def enc(c, i, p):
        return net.apply({"params": p}, c, method="encode")
    timeit_chain(enc, x, (params,), label=f"encode (IR-SE-50 + adapters) {dtname}")

    # full forward
    def full(c, i, p):
        return net.apply({"params": p}, c, mod_size=256,
                         rngs={"noise": jax.random.fold_in(jax.random.PRNGKey(2), i)})
    timeit_chain(full, x, (params,), label=f"full pipeline {dtname}")

    # decode_samm only (frozen lats/feats)
    with jax.default_device(cpu):
        pass
    lats, feats = jax.jit(lambda p, xx: net.apply({"params": p}, xx,
                                                  method="encode"))(params, x)
    jax.block_until_ready(lats)

    def dec(c, i, p, l, f):
        return net.apply({"params": p}, l, f, c, mod_size=256,
                         method="decode_samm",
                         rngs={"noise": jax.random.fold_in(jax.random.PRNGKey(3), i)})
    # chain on x (the blend input) to preserve the data dependency
    timeit_chain(dec, x, (params, lats, list(feats)), label=f"decode_samm {dtname}")
