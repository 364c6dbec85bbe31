"""Full-pipeline A/B profiling on the real TPU: fp32 vs bf16 vs rbg-noise."""
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


def timeit(fn, *args, iters=20, warmup=3, label=""):
    t0 = time.time()
    out = fn(*args); jax.block_until_ready(out)
    c = time.time() - t0
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:46s} {dt:8.2f} ms   (compile {c:.0f}s)", file=sys.stderr)
    return dt


def build(opt):
    net = build_network(dict(opt))
    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        variables = net.init({"params": rng, "noise": rng},
                             jnp.zeros((1, 1024, 1024, 3)), mod_size=256)
    params = jax.device_put(variables["params"], tpu)
    x = jax.device_put(jnp.asarray(x_host), tpu)
    fwd = jax.jit(lambda p, xx, k: net.apply({"params": p}, xx, mod_size=256,
                                             rngs={"noise": k}), device=tpu)
    return fwd, params, x


# A) fp32 (current bench config)
fwd, params, x = build(BASE)
timeit(fwd, params, x, jax.random.PRNGKey(1), label="pipeline fp32 threefry-noise")
# B) fp32 + rbg noise key
krbg = jax.random.key(1, impl="rbg")
timeit(fwd, params, x, krbg, label="pipeline fp32 rbg-noise")

# C) bf16
fwd16, params16, x16 = build({**BASE, "dtype": jnp.bfloat16})
timeit(fwd16, params16, x16, jax.random.PRNGKey(1), label="pipeline bf16 threefry-noise")
timeit(fwd16, params16, x16, krbg, label="pipeline bf16 rbg-noise")
