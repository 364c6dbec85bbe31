"""Compile-probe the MXU warp kernel's scoped-VMEM fit across (batch, scale,
band): Mosaic's multi-buffering depth grows with grid size, so the same
block shapes that fit at b<=4 blew the 16 MB scoped-VMEM limit at b=8
(PERF.md round 2, f32[8,128,128,256] alignment call, 19.03M). AOT-compiles
each config standalone and reports fit/OOM so the band policy in
ops/pallas_warp.py is calibrated by measurement, not modeling."""
import os, sys
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.ops import pallas_warp as pw
from ood_gan_inversion_tpu.ops.pallas_warp import max_disp_px

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]

CFGS = []
for b in (int(v) for v in os.environ.get("B", "8,16").split(",")):
    for (h, c) in ((256, 128), (128, 256)):
        CFGS.append((b, h, c))
BANDS = [int(v) for v in os.environ.get("BANDS", "8,4,2").split(",")]

for b, h, c in CFGS:
    p = max_disp_px(0.08, h)
    for band in BANDS:
        pw.BAND = band
        x = jnp.zeros((b, h, h, c), jnp.float32)
        g = jnp.zeros((b, h, h, 2), jnp.float32)
        a = jnp.zeros((b, h, h, 1), jnp.float32)
        try:
            jax.jit(lambda x, g, a: pw._warp_blend_fwd(x, g, a, p)).lower(
                x, g, a).compile()
            print(f"b={b} h={h} c={c} p={p} band={band}: OK", flush=True)
        except Exception as e:
            msg = str(e)
            tag = "VMEM-OOM" if "vmem" in msg.lower() else "FAIL"
            line = next((l for l in msg.split("\n") if "exceeded" in l), "")
            print(f"b={b} h={h} c={c} p={p} band={band}: {tag} {line[-60:]}",
                  flush=True)
