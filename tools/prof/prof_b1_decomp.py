"""Round-4 b=1 decomposition: where do the ~25 ms/img sit TODAY?

Splits the serving pipeline (bench.py config) into
  full        = encode + adapters + SAMM decode + blend
  noenc       = decode_samm only (lats/feats precomputed, passed as args)
  enc_only    = encode (+ 1x1 adapters) only
so   encoder cost ~= full - noenc   (cross-checked against enc_only)
and pairs with prof_batch (nosamm) / prof_samm_bisect for the SAMM split.

Timing: slope protocol (utils/timing.py) — block_until_ready no longer
blocks in this environment (PERF.md r4 note).
"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network
from ood_gan_inversion_tpu.utils.host_init import cpu_init_params
from ood_gan_inversion_tpu.utils.timing import tree_sum, device_ms_per_call

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)

DTYPE = os.environ.get("DT", "bfloat16")
BATCHES = [int(b) for b in os.environ.get("BATCHES", "1,8").split(",")]

OPT = {
    "type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
    "encoder": "E4E", "enable_modulation": True, "modulation_type": "NOISE",
    "warp_scale": 0.08, "cycle_align": 2, "blend_with_gen": True,
    "dtype": DTYPE,
}

net = build_network(OPT)
params = jax.device_put(cpu_init_params(OPT, (1, 1024, 1024, 3)), tpu)
KEYS = [jax.random.PRNGKey(100 + i) for i in range(16)]


def timeit(fn, argss, label):
    t0 = time.time()
    out = fn(*argss[0])
    float(np.asarray(out))
    comp = time.time() - t0
    ms, _ = device_ms_per_call(fn, argss, windows=3, pair=(3, 13))
    print(f"{label:24s} {ms:8.2f} ms  (compile {comp:.0f}s)", flush=True)
    return ms


for b in BATCHES:
    x_host = np.random.RandomState(0).randn(b, 1024, 1024, 3).astype(
        np.float32)
    x = jax.device_put(jnp.asarray(x_host), tpu)

    full = jax.jit(lambda p, xx, k: tree_sum(net.apply(
        {"params": p}, xx, mod_size=256, rngs={"noise": k})))
    t_full = timeit(full, [(params, x, k) for k in KEYS], f"b={b} full")

    enc = jax.jit(lambda p, xx: tree_sum(net.apply(
        {"params": p}, xx, method="encode")))
    t_enc = timeit(enc, [(params, x)], f"b={b} enc_only")

    enc_raw = jax.jit(lambda p, xx: net.apply({"params": p}, xx,
                                              method="encode"))
    lats, feats_c = enc_raw(params, x)
    dec = jax.jit(lambda p, l, f, xx, k: tree_sum(net.apply(
        {"params": p}, l, f, xx, mod_size=256, method="decode_samm",
        rngs={"noise": k})))
    t_dec = timeit(dec, [(params, lats, feats_c, x, k) for k in KEYS],
                   f"b={b} noenc")

    print(f"b={b}: encoder-in-pipeline ~= {t_full - t_dec:6.2f} ms "
          f"(standalone {t_enc:6.2f});  decode_samm = {t_dec:6.2f}",
          flush=True)
