"""Round-4 consolidated A/B driver: ONE process, ONE CPU param init, then
several trace-time flag configurations benchmarked back-to-back on the real
chip (controls for service drift; avoids paying the ~7-min contended CPU
init per config like per-process env A/Bs do).

Flags are monkeypatched at module level between jits — they are read at
trace time inside the module __call__s, so a fresh jax.jit wrapper picks
them up.

CONFIGS env (comma list) selects from the table; BATCHES (default 1,8).
"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

import ood_gan_inversion_tpu.nn.samm as samm
import ood_gan_inversion_tpu.nn.encoders.e4e as e4e
from ood_gan_inversion_tpu.archs import build_network

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr, flush=True)

OPT = {
    "type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
    "encoder": "E4E", "enable_modulation": True, "modulation_type": "NOISE",
    "warp_scale": 0.08, "cycle_align": 2, "blend_with_gen": True,
    "dtype": "bfloat16",
}

# (label, {module: {attr: value}}) — applied on top of the shipped defaults
from ood_gan_inversion_tpu.ops import pallas_kernels as pk
CONFIG_TABLE = {
    "base":          {},
    "tctx0":         {samm: {"_SAMM_TCTX": False}},
    "egroup0":       {e4e: {"_E4E_GROUPED": False}},
    "egroup1":       {e4e: {"_E4E_GROUPED": True}},
    "tctx0_egroup0": {samm: {"_SAMM_TCTX": False},
                      e4e: {"_E4E_GROUPED": False}},
    "warpbf16_0":    {samm: {"_MXU_WARP_CAST_BF16": "0"}},
    "warpbf16_all":  {samm: {"_MXU_WARP_CAST_BF16": "all"}},
    "convmm":        {pk: {"_CONV_MATMUL": True}},
    "convbf16":      {pk: {"_CONV_BF16": True}},
    "concat1":       {pk: {"_CONCAT1": True}},
    "convmm_c1":     {pk: {"_CONV_MATMUL": True, "_CONCAT1": True}},
    "mxuwarp_b1":    {samm: {"_MXU_WARP": "1", "_MXU_WARP_MIN": 256}},
    "sammfp32_off":  {},  # handled via common._SAMM_FP32 below
}

from ood_gan_inversion_tpu.ops import grid_sample as gs_mod
CONFIG_TABLE["gatherplain"] = {gs_mod: {"_MODE": "gather4plain"}}
CONFIG_TABLE["sammfused"] = {samm: {"_SAMM_FUSED": True}}
CONFIG_TABLE["warpoff"] = {samm: {"_MXU_WARP": "0"}}
CONFIG_TABLE["batchfold0"] = {pk: {"_CONV_BATCHFOLD": "0"}}
from ood_gan_inversion_tpu.archs import common as arch_common
CONFIG_TABLE["sammfp32_off"] = {arch_common: {"_SAMM_FP32": False}}
# after the r4 default flip (OGI_SAMM_FP32_INFER=0), "base" is already the
# bf16 inference island; this restores the old fp32 island for reference
CONFIG_TABLE["fp32island_on"] = {arch_common: {"_SAMM_FP32_INFER": True}}
# r5 warp kernel formulations (ops/pallas_warp.py _KERNEL_VERSION)
from ood_gan_inversion_tpu.ops import pallas_warp as pw_mod
CONFIG_TABLE["warpv4"] = {pw_mod: {"_KERNEL_VERSION": 4}}
CONFIG_TABLE["warpv4_b1"] = {pw_mod: {"_KERNEL_VERSION": 4},
                             samm: {"_MXU_WARP": "1", "_MXU_WARP_MIN": 128}}
CONFIG_TABLE["warpv1_b1"] = {samm: {"_MXU_WARP": "1", "_MXU_WARP_MIN": 128}}
CONFIG_TABLE["warpv3"] = {pw_mod: {"_KERNEL_VERSION": 3}}
# BAND=16 halves the per-band window overlap fetch (each band re-fetches
# its +-p halo; at band=8/p=12 the duplication is 4x). bf16-only: the fp32
# (16+2p)*c row window exceeds the 16K minor-dim VMEM rule.
CONFIG_TABLE["band16"] = {pw_mod: {"BAND": 16}}

CONFIGS = os.environ.get(
    "CONFIGS", "base,tctx0,egroup0,tctx0_egroup0").split(",")
BATCHES = [int(b) for b in os.environ.get("BATCHES", "1,8").split(",")]
ITERS = int(os.environ.get("ITERS", "20"))

t0 = time.time()
net = build_network(OPT)
from ood_gan_inversion_tpu.utils.host_init import cpu_init_params
params = jax.device_put(cpu_init_params(OPT, (1, 1024, 1024, 3)), tpu)
print(f"init done in {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

saved = {}


def apply_patches(patches):
    for mod, attrs in patches.items():
        for a, v in attrs.items():
            saved.setdefault((mod, a), getattr(mod, a))
            setattr(mod, a, v)


def restore():
    for (mod, a), v in saved.items():
        setattr(mod, a, v)
    saved.clear()


xs = {b: jax.device_put(jnp.asarray(np.random.RandomState(0).randn(
    b, 1024, 1024, 3).astype(np.float32)), tpu) for b in BATCHES}

from ood_gan_inversion_tpu.utils.timing import tree_sum, device_ms_per_call
KEYS = [jax.random.PRNGKey(100 + i) for i in range(16)]
for name in CONFIGS:
    apply_patches(CONFIG_TABLE[name])

    def fwd_f(p, xx, k):
        return tree_sum(net.apply({"params": p}, xx, mod_size=256,
                                  rngs={"noise": k}))
    fwd_f.__name__ = "fwd_" + name
    fwd = jax.jit(fwd_f)
    for b in BATCHES:
        x = xs[b]
        t0 = time.time()
        float(np.asarray(fwd(params, x, KEYS[0])))
        comp = time.time() - t0
        n2 = max(5, 13 // b)
        ms, _ = device_ms_per_call(fwd, [(params, x, k) for k in KEYS],
                                   windows=3, pair=(2, n2))
        print(f"{name:16s} b={b}  {ms / b:8.2f} ms/img  "
              f"({b * 1000.0 / ms:6.1f} imgs/s)  compile {comp:.0f}s",
              flush=True)
    restore()
print("ab done", flush=True)
