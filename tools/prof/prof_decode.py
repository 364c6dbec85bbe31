"""Decode-path profiling on the real TPU: where do the 14.6ms go?"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.nn.stylegan2 import Generator

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)

gen = Generator(size=1024)
rng = jax.random.PRNGKey(0)
lat_host = np.random.RandomState(0).randn(1, 18, 512).astype(np.float32)

with jax.default_device(cpu):
    variables = gen.init({"params": rng, "noise": rng}, jnp.zeros((1, 18, 512)))
params = jax.device_put(variables["params"], tpu)
lat = jax.device_put(jnp.asarray(lat_host), tpu)

def timeit(fn, *args, iters=20, warmup=3, label=""):
    t0 = time.time()
    out = fn(*args); jax.block_until_ready(out)
    compile_s = time.time() - t0
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:44s} {dt:8.2f} ms   (compile {compile_s:.0f}s)", file=sys.stderr)
    return dt

# truncated decodes: stop at 64..512 to localize per-stage cost
def truncated(p, l, k, stop_log):
    def run(mdl, latent):
        out = mdl.const_input(1, latent.dtype)
        out = mdl.conv1(out, latent[:, 0])
        skip = mdl.to_rgb1(out, latent[:, 1])
        i = 1
        for idx in range(stop_log - 2):
            out = mdl.convs[2 * idx](out, latent[:, i])
            out = mdl.convs[2 * idx + 1](out, latent[:, i + 1])
            skip = mdl.to_rgbs[idx](out, latent[:, i + 2], skip)
            i += 2
        return skip
    return gen.apply({"params": p}, l, rngs={"noise": k}, method=run)

for stop in (6, 7, 8, 9):  # up to 64 / 128 / 256 / 512
    f_t = jax.jit(lambda p, l, k, s=stop: truncated(p, l, k, s), device=tpu)
    timeit(f_t, params, lat, jax.random.PRNGKey(1),
           label=f"decode to {2**stop}px fp32 (rng noise)")
