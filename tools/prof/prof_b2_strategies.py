"""r5 b=2/4 collapse strategies (VERDICT ask #2). The collapse: b=2 costs
31.7 ms/img vs 22.5 at b=1 (r4) — an achieved-rate drop with the same
instruction mix. The serving mitigation (split_below) pays n host dispatches;
these variants test whether the split can live INSIDE one XLA program:

  plain     — the b=2/b=4 batched program (the collapsing baseline)
  split1    — per-image b=1 sub-programs, concatenated in-graph: XLA sees n
              independent b=1 pipelines in one module and may interleave
              their schedules (latency hiding the host-side split can't)
  map1      — lax.map over the batch (ONE b=1 program body, sequential
              XLA while-loop; small compile, no interleave)

Env: BATCHES (default "2,4"), STRATS (default "plain,split1,map1").
"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from ood_gan_inversion_tpu.archs import build_network
from ood_gan_inversion_tpu.utils.host_init import cpu_init_params
from ood_gan_inversion_tpu.utils.timing import tree_sum, device_ms_per_call
from bench import ARCH_OPT

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, flush=True)

net = build_network(ARCH_OPT)
size = ARCH_OPT["out_size"]
params = jax.device_put(cpu_init_params(
    ARCH_OPT, (1, size, size, 3), seed=0, mod_size=256), tpu)
KEYS = [jax.random.PRNGKey(100 + i) for i in range(8)]

BATCHES = [int(b) for b in os.environ.get("BATCHES", "2,4").split(",")]
STRATS = os.environ.get("STRATS", "plain,split1,map1").split(",")


def one(p, x1, k):
    return net.apply({"params": p}, x1, mod_size=256, rngs={"noise": k})


def make(strat, b):
    if strat == "plain":
        def f(p, xx, k):
            return tree_sum(one(p, xx, k))
    elif strat == "split1":
        def f(p, xx, k):
            keys = jax.random.split(k, b)
            outs = [one(p, xx[i:i + 1], keys[i]) for i in range(b)]
            return sum(tree_sum(o) for o in outs)
    elif strat == "map1":
        def f(p, xx, k):
            keys = jax.random.split(k, b)
            outs = lax.map(lambda ik: tree_sum(one(p, ik[1][None], ik[0])),
                           (keys, xx))
            return jnp.sum(outs)
    f.__name__ = f"{strat}_b{b}"
    return jax.jit(f, device=tpu)


for b in BATCHES:
    x = jax.device_put(jnp.asarray(np.random.RandomState(0).randn(
        b, size, size, 3).astype(np.float32)), tpu)
    for strat in STRATS:
        fwd = make(strat, b)
        try:
            t0 = time.time()
            float(np.asarray(fwd(params, x, KEYS[0])))
            comp = time.time() - t0
            ms, _ = device_ms_per_call(fwd, [(params, x, k) for k in KEYS],
                                       windows=3, pair=(2, max(5, 13 // b)))
            print(f"{strat:8s} b={b}  {ms / b:7.2f} ms/img "
                  f"({b * 1000 / ms:6.1f} imgs/s)  compile {comp:.0f}s",
                  flush=True)
        except Exception as e:
            print(f"{strat:8s} b={b}  FAILED: {str(e)[:200]}", flush=True)
