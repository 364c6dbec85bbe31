"""SAMM/encoder decomposition via bench-style timing (fresh key per call).
Four configs: {fp32, bf16} x {modulation on, off}."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)

x_host = np.random.RandomState(0).randn(1, 1024, 1024, 3).astype(np.float32)

def bench_fwd(net, params, x, label, iters=20):
    fwd = jax.jit(lambda p, xx, k: net.apply({"params": p}, xx, mod_size=256,
                                             rngs={"noise": k}))
    t0 = time.time()
    out = fwd(params, x, jax.random.PRNGKey(1)); jax.block_until_ready(out)
    comp = time.time() - t0
    for i in range(3):
        out = fwd(params, x, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(params, x, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:46s} {dt:8.2f} ms (compile {comp:.0f}s)", file=sys.stderr)

for dtname, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
    for mod in (True, False):
        opt = {"type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
               "encoder": "E4E", "enable_modulation": mod,
               "modulation_type": "NOISE", "warp_scale": 0.08,
               "cycle_align": 2, "blend_with_gen": mod, "dtype": dt}
        net = build_network(opt)
        rng = jax.random.PRNGKey(0)
        with jax.default_device(cpu):
            variables = net.init({"params": rng, "noise": rng},
                                 jnp.zeros((1, 1024, 1024, 3)), mod_size=256)
        params = jax.device_put(variables["params"], tpu)
        x = jax.device_put(jnp.asarray(x_host), tpu)
        bench_fwd(net, params, x, f"pipeline {dtname} samm={'on' if mod else 'off'}")
