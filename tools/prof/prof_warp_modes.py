"""Standalone warp formulations at the collapsing 256px scale
((b,256,256,128)): gather4 take_along_axis, flat jnp.take, patch
single-gather (2x2xC slices), bf16 operand variants. The in-pipeline warp
is batch-flat at ~4.2 ms/img (prof_scale256) — find the formulation with
the fewest/biggest DMA descriptors. In-graph scan chaining."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from ood_gan_inversion_tpu.ops import grid_sample as gs

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)
N_CHAIN = 10
H, C = 256, 128

rs = np.random.RandomState(0)
lin = np.linspace(-1.0, 1.0, H, dtype=np.float32)
base = np.stack(np.meshgrid(lin, lin, indexing="xy"), axis=-1)


def bench(label, fn, x, *rest):
    def body(carry, _):
        out = fn(carry, *rest)
        return carry + (jnp.mean(out) * 1e-12).astype(carry.dtype), ()

    @jax.jit
    def run(x):
        y, _ = lax.scan(body, x, None, length=N_CHAIN)
        return y

    t0 = time.time()
    jax.block_until_ready(run(x)); comp = time.time() - t0
    jax.block_until_ready(run(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, (time.perf_counter() - t0) / N_CHAIN)
    b = x.shape[0]
    print(f"{label:44s} {best*1000:8.3f} ms/op {best*1000/b:7.3f} ms/img "
          f"(compile {comp:.0f}s)", file=sys.stderr)


MODES = os.environ.get(
    "MODES", "gather4,gather4flat,patch,gather4_bf16,patch_bf16").split(",")
for b in (1, 4):
    flow = jnp.asarray(rs.randn(b, H, H, 2) * 0.05, jnp.float32)
    grid = jax.device_put(jnp.asarray(base[None] + flow), tpu)
    t32 = jax.device_put(
        jnp.asarray(rs.randn(b, H, H, C) * 0.5, jnp.float32), tpu)
    t16 = t32.astype(jnp.bfloat16)
    g16 = grid.astype(jnp.bfloat16)

    for m in MODES:
        dt16 = m.endswith("_bf16")
        name = m[:-5] if dt16 else m
        fn = {"gather4": gs._grid_sample_gather4,
              "gather4flat": gs._grid_sample_gather4_flat,
              "patch": gs._grid_sample_patch}[name]
        bench(f"{m} b={b}", fn, t16 if dt16 else t32,
              grid)
