"""b=1 serving-latency knob A/B in one chip session (PERF.md round 3).

Targets VERDICT r2 item 3 (single-chip latency toward the ~15 ms/img
roofline): A/B the un-measured knobs against the default serving config —
  conv_bf16      OGI_SAMM_CONV_BF16: bf16 operands for the algebraic body0
                 convs (fp32 stats/accum), ops/pallas_kernels.py:778
  xla_warp       OGI_XLA_WARP: banded-matmul gather bypass with no
                 custom-call barrier (the MXU warp loses at b=1 BECAUSE of
                 the barrier), ops/matmul_warp.py
  xla_warp_bf16  + OGI_XLA_WARP_BF16 band/selection operands
  combo          conv_bf16 + xla_warp_bf16

CFGS env: comma list of the above (default all). B env: batch (default 1).
Monkeypatches module flags between fresh jit wrappers — each trace re-reads
the flags, and distinct fn identities defeat the jit cache.
"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network
from ood_gan_inversion_tpu.nn import samm
from ood_gan_inversion_tpu.ops import pallas_kernels as pk
from ood_gan_inversion_tpu.ops import matmul_warp as mw

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
B = int(os.environ.get("B", "1"))
from ood_gan_inversion_tpu.utils.host_init import cpu_init_params
params = jax.device_put(cpu_init_params(ARCH, (1, 1024, 1024, 3)), tpu)

CFGS = {
    "base":          {},
    "conv_bf16":     {(pk, "_CONV_BF16"): True},
    "xla_warp":      {(samm, "_XLA_WARP"): True},
    "xla_warp_bf16": {(samm, "_XLA_WARP"): True, (mw, "_BF16"): True},
    "combo":         {(pk, "_CONV_BF16"): True, (samm, "_XLA_WARP"): True,
                      (mw, "_BF16"): True},
}
DEFAULTS = {(pk, "_CONV_BF16"): pk._CONV_BF16,
            (samm, "_XLA_WARP"): samm._XLA_WARP,
            (mw, "_BF16"): mw._BF16,
            (samm, "_MXU_WARP"): samm._MXU_WARP}


def make_fwd(tag):
    def fwd(p, x, key):
        return net.apply({"params": p}, x, mod_size=256,
                         rngs={"noise": key})["image"]
    fwd.__name__ = f"fwd_{tag}"
    return jax.jit(fwd)


def bench(fwd, b, n_iter=16):
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


names = os.environ.get("CFGS", ",".join(CFGS)).split(",")
ref_out = None
for name in names:
    for kv, dv in DEFAULTS.items():
        setattr(kv[0], kv[1], dv)
    samm._MXU_WARP = False  # isolate from the batch-gated MXU kernel
    for (m, a), v in CFGS[name].items():
        setattr(m, a, v)
    ms, comp, out = bench(make_fwd(name), B)
    extra = ""
    if ref_out is None:
        ref_out = out
    else:
        extra = (f"  max|diff|={float(np.max(np.abs(out - ref_out))):.4f}"
                 f" (range {float(ref_out.max() - ref_out.min()):.2f})")
    print(f"{name:14s} b={B} {ms:7.1f} ms ({ms / B:6.2f}/img, "
          f"compile {comp:.0f}s){extra}", file=sys.stderr)
