"""TPU train-path spot check of the MXU-warp gradient gap (VERDICT r3 ask 5).

Under OGI_MXU_WARP=auto at batch >= 2 the SAMM warp forward runs the Pallas
MXU kernel while its custom_vjp backward recomputes the XLA reference
formulation — gradients are for a numerically-close but not identical
function, and the CPU golden train-step parity can't see it (the gate is
off on CPU). This runs ONE full train step (E4E_Face recipe, 1024px, b=2,
plain phase) from a fixed state/rng and prints every logged loss plus
update-norm fingerprints; run it twice (OGI_MXU_WARP=auto / =0) and compare:

  OGI_MXU_WARP=auto python tools/prof/prof_warp_grad_check.py
  OGI_MXU_WARP=0    python tools/prof/prof_warp_grad_check.py

Expected deltas: forward drift <=0.3% rel on the warped feature
(tests/test_pallas_warp.py), so losses should agree to ~1e-3 rel and the
update fingerprints to ~1e-2 rel (Adam normalizes per-param scale).
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

model = build_model(opt)
rng = jax.random.PRNGKey(0)
with jax.default_device(cpu):
    state = model.init_state(rng, (BATCH, SIZE, SIZE, 3))
state = jax.device_put(state, tpu)
old_g = jax.tree_util.tree_map(jnp.asarray, state.params_g_train)
old_d = jax.tree_util.tree_map(jnp.asarray, state.params_d)

x = np.random.RandomState(0).randn(BATCH, 1, SIZE, SIZE, 3).astype(
    np.float32) * 0.5
batch = {"gt": jax.device_put(jnp.asarray(x), tpu),
         "lr": jax.device_put(jnp.asarray(x), tpu),
         "lq_size": jax.device_put(jnp.ones((BATCH, 1), jnp.float32), tpu),
         "deg_type": jax.device_put(jnp.ones((BATCH, 1), jnp.float32), tpu)}

t0 = time.time()
new_state, logs = model.train_step(state, batch, jax.random.PRNGKey(1), 5)
jax.block_until_ready(new_state.params_g_train)
print(f"step done (compile+run {time.time() - t0:.0f}s); "
      f"OGI_MXU_WARP={os.environ.get('OGI_MXU_WARP', 'auto')}")


def tree_norm(a, b):
    sq = sum(float(jnp.sum((jnp.asarray(x) - jnp.asarray(y)).astype(
        jnp.float32) ** 2)) for x, y in zip(jax.tree_util.tree_leaves(a),
                                            jax.tree_util.tree_leaves(b)))
    return sq ** 0.5


for k in sorted(logs):
    print(f"  {k:16s} {float(logs[k]):.6f}")
print(f"  upd_norm_g       {tree_norm(new_state.params_g_train, old_g):.8f}")
print(f"  upd_norm_d       {tree_norm(new_state.params_d, old_d):.8f}")
