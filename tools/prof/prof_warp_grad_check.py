"""TPU train-path spot check of the MXU-warp gradient gap (VERDICT r3 ask 5).

Under OGI_MXU_WARP=auto at batch >= 2 the SAMM warp forward runs the Pallas
MXU kernel while its custom_vjp backward recomputes the XLA reference
formulation -- gradients are for a numerically-close but not identical
function, and the CPU golden train-step parity can't see it (the gate is
off on CPU). This runs ONE full train step (E4E_Face recipe, 1024px, b=2,
plain phase) from a fixed state/rng TWICE in one process -- MXU warp auto
vs forced off (fresh build_model per mode so each traces fresh) -- and
compares every logged loss plus an update FINGERPRINT (per-mode norms and
signed sums of the param deltas for the trainable subtrees).

Memory discipline (r4: two resident full states OOM'd the 16 GB chip):
each mode fetches its scalars and releases every device buffer before the
next mode runs. State init via the cpu_init_model_state subprocess;
completion barriers are scalar fetches (block_until_ready doesn't block).

Expected: forward drift <=0.3% rel on the warped feature
(tests/test_pallas_warp.py), so losses ~1e-3 rel and fingerprints ~1e-2.
"""
import gc
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import yaml
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.models import build_model
from ood_gan_inversion_tpu.nn import samm
from ood_gan_inversion_tpu.utils.host_init import cpu_init_model_state

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
ROOT = __file__.rsplit("/tools/", 1)[0]
with open(f"{ROOT}/options/train/E4E_Face.yml") as f:
    FULL = yaml.safe_load(f)

BATCH = int(os.environ.get("PT_BATCH", "2"))
SIZE = 1024

opt = {k: FULL[k] for k in ("name", "model_type", "is_mimo", "network_g",
                            "network_d", "network_d2", "train")}
opt = yaml.safe_load(yaml.safe_dump(opt))
opt["path"] = {}
opt["network_g"]["out_size"] = SIZE
opt["network_d"]["out_size"] = SIZE
opt["network_g"]["dtype"] = "bfloat16"
opt["train"]["id_opt"].pop("ckpt", None)
opt["train"]["fused_step"] = True

state_host = cpu_init_model_state(opt, (BATCH, SIZE, SIZE, 3), seed=0)
print("state ready", file=sys.stderr, flush=True)

x = np.random.RandomState(0).randn(BATCH, 1, SIZE, SIZE, 3).astype(
    np.float32) * 0.5
batch = {"gt": jax.device_put(jnp.asarray(x), tpu),
         "lr": jax.device_put(jnp.asarray(x), tpu),
         "lq_size": jax.device_put(jnp.ones((BATCH, 1), jnp.float32), tpu),
         "deg_type": jax.device_put(jnp.ones((BATCH, 1), jnp.float32), tpu)}


def fingerprint(new_tree, old_tree_host):
    old = jax.device_put(old_tree_host, tpu)
    f = jax.jit(lambda a, b: (
        sum(jnp.sum((jnp.asarray(p) - jnp.asarray(q)).astype(
            jnp.float32) ** 2) for p, q in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))),
        sum(jnp.sum((jnp.asarray(p) - jnp.asarray(q)).astype(jnp.float32))
            for p, q in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b)))))
    sq, sg = f(new_tree, old)
    return float(np.asarray(sq)) ** 0.5, float(np.asarray(sg))


def run(mode):
    samm._MXU_WARP = mode
    model = build_model(opt)          # fresh jit cache per mode
    state = jax.device_put(state_host, tpu)
    t0 = time.time()
    # step index LATE in the curriculum (mod_size=256 so the >=128px SAMM
    # scales exist -- at early steps the MXU warp never engages and the
    # check compares identical programs; plain phase: 99999 misses both
    # reg cadences in the recipe)
    step_idx = int(os.environ.get("PT_STEP", "99999"))
    new_state, logs = model.train_step(state, batch, jax.random.PRNGKey(1),
                                       step_idx)
    logs = {k: float(np.asarray(v)) for k, v in logs.items()}
    print(f"mode={mode}: step done (compile+run {time.time() - t0:.0f}s)",
          flush=True)
    ng, sg = fingerprint(new_state.params_g_train, state_host.params_g_train)
    nd, sd = fingerprint(new_state.params_d, state_host.params_d)
    del new_state, state, model
    gc.collect()
    return logs, (ng, sg, nd, sd)


PAIR = None
res = {}
# PT_MODES: the gate values to compare. Default "1,0" FORCES the kernel on
# vs off -- "auto" only engages at batch >= 2, but the >=128px curriculum
# stages OOM v5e HBM at b=2 (PERF.md r4), so the valid spot check is
# b=1 + forced gate at PT_STEP=99999 (mod_size 256).
MODES = os.environ.get("PT_MODES", "1,0").split(",")
for mode in MODES:
    res[mode] = run(mode)

la, fa = res[MODES[0]]
l0, f0 = res[MODES[1]]
print(f"{'loss':16s} {MODES[0]:>12s} {MODES[1]:>12s} {'rel delta':>10s}")
for k in sorted(la):
    a, b = la[k], l0[k]
    rel = abs(a - b) / max(abs(a), abs(b), 1e-9)
    print(f"{k:16s} {a:12.6f} {b:12.6f} {rel:10.2e}", flush=True)
names = ["|upd_g|", "sum(upd_g)", "|upd_d|", "sum(upd_d)"]
for n, a, b in zip(names, fa, f0):
    rel = abs(a - b) / max(abs(a), abs(b), 1e-12)
    print(f"{n:16s} {a:12.6e} {b:12.6e} rel {rel:10.2e}", flush=True)
