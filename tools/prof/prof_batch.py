"""Bisect the batch>1 throughput collapse (round-1 PERF: b=4 was SLOWER
per image than b=1). Pipeline timings at b=1/2/4/8 for: full pipeline,
SAMM off, packed tail off. bench-style timing (fresh keys, block at end)."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)

DTYPE = os.environ.get("DT", "bfloat16")
BATCHES = [int(b) for b in os.environ.get("BATCHES", "1,4,8").split(",")]
MODES = os.environ.get("MODES", "full,nosamm").split(",")


def run(label, opt, batches):
    net = build_network(opt)
    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        variables = net.init({"params": rng, "noise": rng},
                             jnp.zeros((1, 1024, 1024, 3)), mod_size=256)
    params = jax.device_put(variables["params"], tpu)
    fwd = jax.jit(lambda p, xx, k: net.apply({"params": p}, xx, mod_size=256,
                                             rngs={"noise": k}))
    for b in batches:
        x_host = np.random.RandomState(0).randn(b, 1024, 1024, 3).astype(
            np.float32)
        x = jax.device_put(jnp.asarray(x_host), tpu)
        t0 = time.time()
        out = fwd(params, x, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        comp = time.time() - t0
        iters = max(4, 16 // b)
        for i in range(2):
            out = fwd(params, x, jax.random.PRNGKey(i))
        jax.block_until_ready(out)
        best = 1e9
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                out = fwd(params, x, jax.random.PRNGKey(100 + w * iters + i))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        ms = best * 1000
        print(f"{label:28s} b={b}  {ms:8.1f} ms/step  {ms / b:7.2f} ms/img  "
              f"({b / best:.1f} imgs/s, compile {comp:.0f}s)", file=sys.stderr)


BASE = {
    "type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
    "encoder": "E4E", "enable_modulation": True, "modulation_type": "NOISE",
    "warp_scale": 0.08, "cycle_align": 2, "blend_with_gen": True,
    "dtype": DTYPE,
}

if "full" in MODES:
    run(f"full {DTYPE}", BASE, BATCHES)
if "nosamm" in MODES:
    opt = dict(BASE)
    opt["enable_modulation"] = False
    opt["blend_with_gen"] = False
    run(f"no-SAMM {DTYPE}", opt, BATCHES)
if "nopack" in MODES:
    os.environ["OGI_PACKED_TAIL"] = "0"
    print("NOTE: nopack requires a fresh process (env read at import)",
          file=sys.stderr)
