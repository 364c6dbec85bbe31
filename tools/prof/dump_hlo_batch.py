"""Dump the optimized HLO of the full serving pipeline at b=1 and b=4 to
/tmp/hlo_b{1,4}.txt for op-mix diffing (batch-collapse investigation: every
SAMM op batches fine standalone, so the pathology must be visible as a
program-level difference — fusion shapes, copies, layout transposes, conv
configs)."""
import os, sys
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network
from bench import ARCH_OPT

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
net = build_network(ARCH_OPT)
rng = jax.random.PRNGKey(0)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    variables = net.init({"params": rng, "noise": rng},
                         jnp.zeros((1, 1024, 1024, 3)), mod_size=256)
params = jax.device_put(variables["params"], tpu)

for b in (int(a) for a in (sys.argv[1:] or ["1", "4"])):
    x = jax.device_put(jnp.zeros((b, 1024, 1024, 3)), tpu)
    fwd = jax.jit(lambda p, xx, k: net.apply(
        {"params": p}, xx, mod_size=256, rngs={"noise": k}), device=tpu)
    compiled = fwd.lower(params, x, jax.random.PRNGKey(1)).compile()
    txt = compiled.as_text()
    path = f"/tmp/hlo_b{b}.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(path, len(txt.splitlines()), "lines", file=sys.stderr)
