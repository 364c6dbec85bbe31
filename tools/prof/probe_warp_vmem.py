"""Compile-probe the MXU warp kernel's scoped-VMEM fit across (batch, scale,
band). Measured result (this probe, b in {4,8,16}, band 8; PERF.md r3):
fit is BATCH-INDEPENDENT — (h=256,c=128,p=12) compiles OK at every batch,
(h=128,c=256,p=7) blows the 16 MB scoped-VMEM limit (19.03M alloc for the
f32 out block) at every batch; bands 4/2 fail Mosaic lowering outright.
AOT-compiles each config standalone and reports fit/OOM so the feasibility
rule in ops/pallas_warp.py:mxu_warp_supported is calibrated by measurement,
not modeling."""
import os, sys
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.ops import pallas_warp as pw
from ood_gan_inversion_tpu.ops.pallas_warp import max_disp_px

assert jax.default_backend() != "cpu", (
    "probe must compile for the TPU backend (got cpu) — run with the axon "
    "tunnel up; JAX_PLATFORMS=axon,cpu makes jit target the TPU by default")

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
