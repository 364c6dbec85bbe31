"""A/B: OGI_MXU_WARP_BF16 "1" (cast only VMEM-bound scales) vs "all" (cast
every MXU warp, incl. the fp32-fitting 256px scale) at batch 8."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network
from ood_gan_inversion_tpu.nn import samm

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)

ARCH = {
    "type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
    "encoder": "E4E", "enable_modulation": True, "modulation_type": "NOISE",
    "warp_scale": 0.08, "cycle_align": 2, "blend_with_gen": True,
    "dtype": "bfloat16",
}
net = build_network(dict(ARCH))
rng = jax.random.PRNGKey(0)
with jax.default_device(cpu):
    params = net.init({"params": rng, "noise": rng},
                      jnp.zeros((1, 1024, 1024, 3)), mod_size=256)["params"]
params = jax.device_put(params, tpu)
samm._MXU_WARP = True  # force the kernel on regardless of batch gate


def make_fwd(tag):
    def fwd(p, x, key):
        return net.apply({"params": p}, x, mod_size=256,
                         rngs={"noise": key})["image"]
    fwd.__name__ = f"fwd_{tag}"
    return jax.jit(fwd)


def bench(fwd, b, n_iter=4):
    x = jax.device_put(jnp.asarray(
        np.random.RandomState(0).randn(b, 1024, 1024, 3).astype(np.float32)
        * 0.5), tpu)
    t0 = time.time()
    out = fwd(params, x, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    comp = time.time() - t0
    for _ in range(2):
        out = fwd(params, x, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fwd(params, x, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best * 1000, comp, np.asarray(out.astype(jnp.float32))


B = int(os.environ.get("B", "8"))
outs = {}
for mode in ("1", "all"):
    samm._MXU_WARP_CAST_BF16 = mode
    ms, comp, out = bench(make_fwd(f"cast{mode}"), B)
    outs[mode] = out
    print(f"cast={mode:3s} b={B}  {ms:7.1f} ms ({ms / B:6.2f}/img, "
          f"compile {comp:.0f}s)", file=sys.stderr)
d = float(np.max(np.abs(outs["1"] - outs["all"])))
r = float(outs["1"].max() - outs["1"].min())
print(f"max|diff|={d:.4f} (range {r:.2f})", file=sys.stderr)
