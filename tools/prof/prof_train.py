"""Training-step timing: the E4E_Face 1024px batch-2 workload, fp32 vs the
bf16(+fp32-SAMM-island) network config."""
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
    full = yaml.safe_load(f)

SIZE = int(os.environ.get("PT_SIZE", "1024"))
BATCH = int(os.environ.get("PT_BATCH", "2"))


def run(dtype_str, label):
    opt = {k: full[k] for k in
           ("name", "model_type", "is_mimo", "network_g", "network_d",
            "network_d2", "train")}
    opt = yaml.safe_load(yaml.safe_dump(opt))  # deep copy
    opt["path"] = {}
    opt["network_g"]["out_size"] = SIZE
    opt["network_d"]["out_size"] = SIZE
    if dtype_str:
        opt["network_g"]["dtype"] = dtype_str
    # drop ckpt pointers (weights not present in this env)
    opt["train"]["id_opt"].pop("ckpt", None)
    # PT_FUSED=0 -> the three split-phase programs (round-1 design) for the
    # fused-vs-split same-session A/B
    opt["train"]["fused_step"] = os.environ.get("PT_FUSED", "1") == "1"
    model = build_model(opt)

    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        state = model.init_state(rng, (BATCH, SIZE, SIZE, 3))
    state = jax.device_put(state, tpu)
    x = np.random.RandomState(0).randn(BATCH, 1, SIZE, SIZE, 3).astype(np.float32) * 0.5
    batch = {
        "gt": jax.device_put(jnp.asarray(x), tpu),
        "lr": jax.device_put(jnp.asarray(x), tpu),
        "lq_size": jax.device_put(jnp.ones((BATCH, 1), jnp.float32), tpu),
        "deg_type": jax.device_put(jnp.ones((BATCH, 1), jnp.float32), tpu),
    }
    t0 = time.time()
    state, logs = model.train_step(state, batch, jax.random.PRNGKey(1), 5)
    jax.block_until_ready(state.params_g_train)
    comp = time.time() - t0
    # warmup + timed steps sharing step-5's static flags (same mod_size/stage)
    for i in (6, 7):
        state, logs = model.train_step(state, batch, jax.random.PRNGKey(i), 5)
    jax.block_until_ready(state.params_g_train)
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, logs = model.train_step(state, batch,
                                       jax.random.PRNGKey(10 + i), 5)
    jax.block_until_ready(state.params_g_train)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:40s} {dt:8.1f} ms/step (compile {comp:.0f}s)",
          file=sys.stderr)


run(None, f"{SIZE}px b{BATCH} fp32")
run("bfloat16", f"{SIZE}px b{BATCH} bf16+fp32-SAMM-island")
