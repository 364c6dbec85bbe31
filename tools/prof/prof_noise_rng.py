"""b=1 probe (round 4): what do the per-call noise draws cost?

The serving pipeline draws ~2.8M N(0,1) elements per 1024px image through
flax's 'noise' rng stream (NoiseInjection at every generator layer) —
matching the reference's randomize_noise=True protocol
(/root/reference/src/ops/StyleGAN/model.py:504-509: noise=None =>
torch.randn_like inside the timed region). torch's curand is ~free on GPU;
JAX's default threefry on TPU is ALU-heavy, so this may be a hidden b=1 tax
that the SAMM bisects could not see (they always drew noise).

Variants (fresh jit identity per variant; CFGS env to filter):
  base     default threefry draws (bench.py protocol)
  zeros    NoiseInjection adds nothing — UPPER BOUND on the whole noise path
           (draw + add); not protocol-legal, measurement only
  hoisted  noise tensors precomputed once on device and passed as args —
           what a "fixed noise buffers" serving mode would cost
  rbg      jax_default_prng_impl=rbg for the noise key (hardware RNG;
           same N(0,1) distribution, different stream) — protocol-legal

Timing: slope protocol (utils/timing.py).
"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network
from ood_gan_inversion_tpu.nn import stylegan2 as sg2
from ood_gan_inversion_tpu.utils.host_init import cpu_init_params
from ood_gan_inversion_tpu.utils.timing import tree_sum, device_ms_per_call

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)

ARCH = {
    "type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
    "encoder": "E4E", "enable_modulation": True, "modulation_type": "NOISE",
    "warp_scale": 0.08, "cycle_align": 2, "blend_with_gen": True,
    "dtype": "bfloat16",
}
net = build_network(dict(ARCH))
B = int(os.environ.get("B", "1"))
params = jax.device_put(cpu_init_params(ARCH, (1, 1024, 1024, 3)), tpu)
x = jax.device_put(jnp.asarray(
    np.random.RandomState(0).randn(B, 1024, 1024, 3).astype(np.float32)
    * 0.5), tpu)

# generator noise shapes: conv1 @4px then pairs at 8..1024px
SIZES = [4] + [s for k in range(3, 11) for s in (2 ** k, 2 ** k)]
noise_fixed = [jax.device_put(
    jnp.asarray(np.random.RandomState(i).randn(B, s, s, 1).astype(np.float32)),
    tpu) for i, s in enumerate(SIZES)]

_orig_call = sg2.NoiseInjection.__call__


def bench(fwd, argss, tag):
    t0 = time.time()
    out = fwd(*argss[0])
    float(np.asarray(out))
    comp = time.time() - t0
    ms, _ = device_ms_per_call(fwd, argss, windows=3, pair=(3, 13))
    print(f"{tag:10s} b={B} {ms:7.2f} ms ({ms / B:6.2f}/img,"
          f" compile {comp:.0f}s)", file=sys.stderr, flush=True)


def run(name):
    sg2.NoiseInjection.__call__ = _orig_call
    if name == "zeros":
        sg2.NoiseInjection.__call__ = lambda self, image, noise=None: image
    keys = [jax.random.PRNGKey(100 + i) for i in range(16)]
    if name == "rbg":
        keys = [jax.random.PRNGKey(100 + i, impl="rbg") for i in range(16)]
    if name == "hoisted":
        def fwd(p, xx, nz0):
            nz = [nz0] + noise_fixed[1:]
            return tree_sum(net.apply({"params": p}, xx, mod_size=256,
                                      noise=nz,
                                      rngs={"noise": jax.random.PRNGKey(0)}))
        fwd.__name__ = f"fwd_{name}"
        bench(jax.jit(fwd), [(params, x, noise_fixed[0])], name)
        return
    def fwd(p, xx, k):
        return tree_sum(net.apply({"params": p}, xx, mod_size=256,
                                  rngs={"noise": k}))
    fwd.__name__ = f"fwd_{name}"
    bench(jax.jit(fwd), [(params, x, k) for k in keys], name)


for v in os.environ.get("CFGS", "base,zeros,hoisted,rbg").split(","):
    run(v)
