"""TPU train-path spot check of the MXU-warp gradient gap (VERDICT r3 ask 5).

Under OGI_MXU_WARP=auto at batch >= 2 the SAMM warp forward runs the Pallas
MXU kernel while its custom_vjp backward recomputes the XLA reference
formulation -- gradients are for a numerically-close but not identical
function, and the CPU golden train-step parity can't see it (the gate is
off on CPU). This runs ONE full train step (E4E_Face recipe, 1024px, b=2,
plain phase) from a fixed state/rng TWICE in one process -- MXU warp auto
vs forced off (two build_model instances so each traces fresh) -- and
prints every logged loss plus the relative update-norm delta.

State init: cpu_init_model_state subprocess (r4 environment: in-process
eager init hangs). Completion barriers are scalar fetches (r4:
block_until_ready does not block).

Expected deltas: forward drift <=0.3% rel on the warped feature
(tests/test_pallas_warp.py), so losses should agree to ~1e-3 rel and the
update norms to ~1e-2 rel (Adam normalizes per-param scale).
"""
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


def run(mode):
    samm._MXU_WARP = mode
    model = build_model(opt)          # fresh jit cache per mode
    # fresh device copy per mode: train_step DONATES the input state, so
    # reusing one device-resident state across modes hits deleted buffers
    state = jax.device_put(state_host, tpu)
    t0 = time.time()
    new_state, logs = model.train_step(state, batch, jax.random.PRNGKey(1), 5)
    logs = {k: float(np.asarray(v)) for k, v in logs.items()}
    print(f"mode={mode}: step done (compile+run {time.time() - t0:.0f}s)",
          flush=True)
    return new_state, logs


res = {}
for mode in ("auto", "0"):
    res[mode] = run(mode)

diffnorm = jax.jit(lambda a, b: (
    sum(jnp.sum((jnp.asarray(p) - jnp.asarray(q)).astype(jnp.float32) ** 2)
        for p, q in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))) ** 0.5,
    sum(jnp.sum(jnp.asarray(p).astype(jnp.float32) ** 2)
        for p in jax.tree_util.tree_leaves(a)) ** 0.5))

sa, la = res["auto"]
s0, l0 = res["0"]
print(f"{'loss':16s} {'auto':>12s} {'off':>12s} {'rel delta':>10s}")
for k in sorted(la):
    a, b = la[k], l0[k]
    rel = abs(a - b) / max(abs(a), abs(b), 1e-9)
    print(f"{k:16s} {a:12.6f} {b:12.6f} {rel:10.2e}", flush=True)
for name, pa, p0 in (("params_g_train", sa.params_g_train, s0.params_g_train),
                     ("params_d", sa.params_d, s0.params_d)):
    d, n = diffnorm(pa, p0)
    d, n = float(np.asarray(d)), float(np.asarray(n))
    print(f"update-delta {name}: |auto-off|={d:.6e}  |auto|={n:.6e}  "
          f"rel={d / max(n, 1e-12):.2e}", flush=True)
