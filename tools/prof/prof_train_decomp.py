"""Train-step decomposition at the reference workload (1024px, batch 2):
time the fused step with loss terms / phases ablated from the config, so the
whole-program deltas attribute the 620+ ms/step (PERF.md round-2 protocol:
per-op timings through the tunnel are untrustworthy; only whole-step deltas
are comparable).

VARIANTS env selects (comma-separated):
  full      — E4E_Face.yml losses as shipped
  nopercep  — drop perceptual_opt (VGG19 fwd+bwd inside the G step)
  noid      — drop id_opt (ArcFace fwd+bwd)
  nomask    — drop mask_opt
  nopix     — drop pix_opt (MSE)
  nod       — drop gan_opt (no D phase, no G-GAN term)
  nod2      — skip the latent-D phase
  gonly     — nod + nod2 (pure reconstruction step)
  noremat   — remat off (expected OOM at 1024; documents why it's on)
"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import yaml
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.models import build_model

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)

ROOT = __file__.rsplit("/tools/", 1)[0]
with open(f"{ROOT}/options/train/E4E_Face.yml") as f:
    FULL = yaml.safe_load(f)

SIZE = int(os.environ.get("PT_SIZE", "1024"))
BATCH = int(os.environ.get("PT_BATCH", "2"))
DTYPE = os.environ.get("PT_DTYPE", "bfloat16")
VARIANTS = os.environ.get(
    "VARIANTS", "full,nopercep,noid,nomask,nopix,nod,nod2,gonly").split(",")


def make_opt(variant):
    opt = {k: FULL[k] for k in
           ("name", "model_type", "is_mimo", "network_g", "network_d",
            "network_d2", "train")}
    opt = yaml.safe_load(yaml.safe_dump(opt))  # deep copy
    opt["path"] = {}
    opt["network_g"]["out_size"] = SIZE
    opt["network_d"]["out_size"] = SIZE
    if DTYPE:
        opt["network_g"]["dtype"] = DTYPE
    opt["train"]["id_opt"].pop("ckpt", None)
    opt["train"]["fused_step"] = True
    tr = opt["train"]
    vgg_dt = os.environ.get("PT_VGG_DTYPE", "")
    if vgg_dt and "perceptual_opt" in tr:
        tr["perceptual_opt"]["dtype"] = vgg_dt
    if variant in ("nopercep",):
        del tr["perceptual_opt"]
    elif variant == "noid":
        del tr["id_opt"]
    elif variant == "nomask":
        del tr["mask_opt"]
    elif variant == "nopix":
        del tr["pix_opt"]
    elif variant == "nod":
        del tr["gan_opt"]
    elif variant == "nod2":
        tr["skip_latent_g"] = True
        del opt["network_d2"]
    elif variant == "gonly":
        del tr["gan_opt"]
        tr["skip_latent_g"] = True
        del opt["network_d2"]
    elif variant == "noremat":
        tr["remat"] = False
    return opt


def run(variant):
    from ood_gan_inversion_tpu.utils.host_init import cpu_init_model_state
    opt = make_opt(variant)
    model = build_model(opt)
    state_host = cpu_init_model_state(opt, (BATCH, SIZE, SIZE, 3), seed=0)
    x = np.random.RandomState(0).randn(
        BATCH, 1, SIZE, SIZE, 3).astype(np.float32) * 0.5
    batch = {
        "gt": jax.device_put(jnp.asarray(x), tpu),
        "lr": jax.device_put(jnp.asarray(x), tpu),
        "lq_size": jax.device_put(jnp.ones((BATCH, 1), jnp.float32), tpu),
        "deg_type": jax.device_put(jnp.ones((BATCH, 1), jnp.float32), tpu),
    }

    RT = 0.030  # measured per-fetch host round-trip (PERF.md r4, ~29 ms)

    try:
        # ONE upload; train_step donates, so the state threads through every
        # step below (never re-uploaded — per-window uploads made the r4
        # first-cut slope useless: windows 427/872/1772 ms).
        state = jax.device_put(state_host, tpu)
        # PT_STEP picks the curriculum stage: the recipe is progressive
        # (progressiveModSize [32,64,128,256] from step 2000 every 4000),
        # so step 5 = mod_size 32 (SAMM at one scale) while PT_STEP=99999
        # = the full mod_size-256 workload. Historical rounds measured
        # step 5; state both when recording.
        step_idx = int(os.environ.get("PT_STEP", "5"))
        t0 = time.time()
        state, logs = model.train_step(state, batch, jax.random.PRNGKey(1),
                                       step_idx)
        float(np.asarray(next(iter(logs.values()))))   # drain upload+step0
        comp = time.time() - t0
        samples = []
        n = 5
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(n):
                state, logs = model.train_step(
                    state, batch, jax.random.PRNGKey(20 + w * n + i),
                    step_idx)
            float(np.asarray(next(iter(logs.values()))))
            samples.append((time.perf_counter() - t0 - RT) * 1000.0 / n)
        ms = float(np.median(samples))
        print(f"{variant:10s} {ms:8.1f} ms/step (compile {comp:.0f}s; "
              f"windows {['%.0f' % s for s in samples]})",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"{variant:10s} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", file=sys.stderr, flush=True)


for v in VARIANTS:
    run(v)
