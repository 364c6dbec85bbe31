"""End-to-end A/B of the whole-stage Pallas kernel (fused_packed_stage) in
the full 1024px inversion pipeline (PERF.md r3: the band-4 configuration
fits scoped VMEM at the real tail shapes — band 8 crashes the compiler —
and matches the XLA reference to bf16 tolerance standalone).

B env: comma batches (default 1,8).
"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network
import ood_gan_inversion_tpu.nn.stylegan2 as sg

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


def make_fwd(tag):
    def fwd(p, x, key):
        return net.apply({"params": p}, x, mod_size=256,
                         rngs={"noise": key})["image"]
    fwd.__name__ = f"fwd_{tag}"
    return jax.jit(fwd)


def bench(fwd, b, n_iter):
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


for b in [int(v) for v in os.environ.get("B", "1,8").split(",")]:
    n_iter = max(4, 16 // b)
    sg._PALLAS_PAIR = False
    os.environ["OGI_PALLAS_STAGE"] = "0"
    ms0, c0, out0 = bench(make_fwd(f"off{b}"), b, n_iter)
    sg._PALLAS_PAIR = True
    os.environ["OGI_PALLAS_STAGE"] = "1"
    ms1, c1, out1 = bench(make_fwd(f"on{b}"), b, n_iter)
    diff = float(np.max(np.abs(out0 - out1)))
    rng_ = float(out0.max() - out0.min())
    print(f"b={b}  OFF {ms0:7.1f} ms ({ms0 / b:6.2f}/img, compile {c0:.0f}s)"
          f"  STAGE-ON {ms1:7.1f} ms ({ms1 / b:6.2f}/img, compile {c1:.0f}s)"
          f"  max|diff|={diff:.4f} (range {rng_:.2f})", file=sys.stderr)
