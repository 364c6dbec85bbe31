"""A/B the v2 (per-source-row folded-selection, x-tiled) MXU warp kernel
against v1 (per-output-row full-window dot) on the real chip, standalone,
at the pipeline's 256px and 128px SAMM shapes (r5 VERDICT ask #1/#3: the
warp's kv~25x horizontal overwork is the b=8 ceiling).

Protocol: slope timing (utils/timing.py) of a jitted scalar-epilogue call.
"""
import os, sys
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.ops import pallas_warp as pw
from ood_gan_inversion_tpu.utils.timing import device_ms_per_call, tree_sum

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, flush=True)

rs = np.random.RandomState(0)
CASES = [(1, 256, 128, 0.08), (8, 256, 128, 0.08),
         (1, 128, 256, 0.08), (8, 128, 256, 0.08)]
DT = jnp.bfloat16

for b, size, c, scale in CASES:
    p = pw.max_disp_px(scale, size)
    if not pw.mxu_warp_supported(size, size, c, p, 2):
        print(f"b={b} {size}px c={c}: unsupported, skip")
        continue
    lin = np.linspace(-1, 1, size, dtype=np.float32)
    base = np.stack(np.meshgrid(lin, lin, indexing="xy"), -1)
    x = jax.device_put(jnp.asarray(rs.randn(b, size, size, c), DT), tpu)
    grid = jax.device_put(jnp.asarray(
        base[None] + np.tanh(rs.randn(b, size, size, 2)) * scale,
        jnp.float32), tpu)
    al = jax.device_put(jnp.asarray(rs.rand(b, size, size, 1), jnp.float32),
                        tpu)

    for ver in (int(v) for v in
                os.environ.get("VERS", "1,2").split(",")):
        if ver >= 2 and pw.warp_tile(size, p) == 0:
            print(f"  v2 n/a at {size}px p={p}")
            continue
        fn = jax.jit(lambda x, g, a, _v=ver: tree_sum(
            pw._warp_blend_fwd(x, g, a, p, version=_v)), device=tpu)
        r = fn(x, grid, al)
        _ = float(np.asarray(r))  # compile+run
        ms, _s = device_ms_per_call(fn, [(x, grid, al)], windows=3)
        print(f"b={b} {size}px c={c} p={p} v{ver}: {ms:7.3f} ms/call "
              f"{ms/b:7.3f} ms/img", flush=True)

# numeric check on-chip: v1 vs v2 at 256px
b, size, c, scale = 2, 256, 128, 0.08
p = pw.max_disp_px(scale, size)
lin = np.linspace(-1, 1, size, dtype=np.float32)
base = np.stack(np.meshgrid(lin, lin, indexing="xy"), -1)
x = jax.device_put(jnp.asarray(rs.randn(b, size, size, c), DT), tpu)
grid = jax.device_put(jnp.asarray(
    base[None] + np.tanh(rs.randn(b, size, size, 2)) * scale,
    jnp.float32), tpu)
al = jax.device_put(jnp.asarray(rs.rand(b, size, size, 1), jnp.float32), tpu)
o1 = np.asarray(jax.jit(lambda *a: pw._warp_blend_fwd(*a, p, version=1),
                        device=tpu)(x, grid, al)).astype(np.float32)
o2 = np.asarray(jax.jit(lambda *a: pw._warp_blend_fwd(*a, p, version=2),
                        device=tpu)(x, grid, al)).astype(np.float32)
print("on-chip v1-vs-v2 max abs diff:", float(np.max(np.abs(o1 - o2))))
