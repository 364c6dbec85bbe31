"""r5 flag battery: per-compile XLA TPU flag A/Bs on the full b=1 pipeline
(VERDICT r4 ask #1 — the body0 convs are MXU-schedule-bound; work the XLA
lowering via compiler_options, the channel proven by the r4 scoped-vmem
A/B). Each trial is a distinct compile (4-11 min through the relay); slope
protocol timings.

Usage: TRIALS=base,downcast python tools/prof/prof_flags_r5.py
"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network
from ood_gan_inversion_tpu.utils.host_init import cpu_init_params
from ood_gan_inversion_tpu.utils.timing import tree_sum, device_ms_per_call
from bench import ARCH_OPT

TRIALS = {
    "base": None,
    # the bf16 island downcasts conv inputs; allowing the convert to fuse
    # INTO the conv input removes a materialization pass
    "downcast": {"xla_tpu_allow_conv_input_fusion_with_downcast_convert":
                 "true"},
    "aggr_layout": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt":
                    "true"},
    "autotune_layouts": {"xla_tpu_autotune_layouts": "true"},
    "brkga": {"xla_tpu_enable_brkga_latency_hiding_scheduler": "true"},
    "ilp": {"xla_tpu_enable_ilp_latency_hiding_scheduler": "true"},
    "layout_hints": {"xla_tpu_enable_layout_hints": "true"},
    "fusion_layout_update": {"xla_tpu_enable_fusion_layout_update": "true"},
    "rwb": {"xla_tpu_rwb_fusion": "true"},
    "minimalloc": {"xla_tpu_msa_use_minimalloc": "true"},
}

want = os.environ.get("TRIALS")
names = want.split(",") if want else list(TRIALS)

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, flush=True)

net = build_network(ARCH_OPT)
size = ARCH_OPT["out_size"]
params = jax.device_put(cpu_init_params(
    ARCH_OPT, (1, size, size, 3), seed=0, mod_size=256), tpu)
BATCHES = [int(b) for b in os.environ.get("BATCHES", "1,2").split(",")]
xs = {b: jax.device_put(jnp.asarray(np.random.RandomState(0).randn(
    b, size, size, 3).astype(np.float32)), tpu) for b in BATCHES}
KEYS = [jax.random.PRNGKey(100 + i) for i in range(8)]

results = {}
for tag in names:
    co = TRIALS[tag]
    f = lambda p, xx, k: tree_sum(net.apply({"params": p}, xx, mod_size=256,
                                            rngs={"noise": k}))
    f.__name__ = "fwd_" + tag
    kw = {"compiler_options": co} if co else {}
    for b in BATCHES:
        x = xs[b]
        try:
            fwd = jax.jit(f, device=tpu, **kw)
            t0 = time.time()
            float(np.asarray(fwd(params, x, KEYS[0])))
            comp = time.time() - t0
            n2 = max(5, 13 // b)
            ms, _ = device_ms_per_call(fwd, [(params, x, k) for k in KEYS],
                                       windows=3, pair=(2, n2))
            results[(tag, b)] = ms / b
            print(f"{tag:22s} b={b}  {ms / b:7.2f} ms/img  "
                  f"(compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag:22s} b={b}  FAILED: {str(e)[:300]}", flush=True)

print("summary:", {f"{k[0]}_b{k[1]}": round(v, 2)
                   for k, v in results.items()}, flush=True)
