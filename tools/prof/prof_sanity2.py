"""Bisect: time prof_stage's naive_stage with the known-good harness."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0]), math
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.ops.modulated import modulated_conv2d
from ood_gan_inversion_tpu.ops.upfirdn2d import make_kernel, upsample2x
from ood_gan_inversion_tpu.ops.fused_act import fused_leaky_relu

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
BLUR = make_kernel((1, 3, 3, 1))
CIN, CMID, H = 64, 32, 512
rs = np.random.RandomState(0)

@jax.jit
def naive_stage(x, skip, w1, w2, wr, s1, s2, sr, n1, n2, rgbb):
    blur = jnp.asarray(BLUR)
    z = modulated_conv2d(x, w1, s1, True, upsample=True, blur_kernel=blur)
    z = fused_leaky_relu(z + 0.1 * n1, None)
    z = modulated_conv2d(z, w2, s2, True, blur_kernel=blur)
    z = fused_leaky_relu(z + 0.1 * n2, None)
    rgb = modulated_conv2d(z, wr, sr, False) + rgbb
    return rgb + upsample2x(skip, blur)

vals = [
    rs.randn(1, H, H, CIN), rs.randn(1, H, H, 3),
    rs.randn(3, 3, CIN, CMID), rs.randn(3, 3, CMID, CMID),
    rs.randn(1, 1, CMID, 3),
    rs.rand(1, CIN) + 0.5, rs.rand(1, CMID) + 0.5, rs.rand(1, CMID) + 0.5,
    rs.randn(1, 2 * H, 2 * H, 1), rs.randn(1, 2 * H, 2 * H, 1),
    rs.randn(1, 1, 1, 3),
]
args = [jax.device_put(jnp.asarray(v.astype(np.float32)), tpu) for v in vals]

out = naive_stage(*args)
jax.block_until_ready(out)
print("mean", float(jnp.mean(out)), file=sys.stderr)
for _ in range(3):
    out = naive_stage(*args)
jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(20):
    out = naive_stage(*args)
jax.block_until_ready(out)
print(f"naive stage enqueue-20: {(time.perf_counter()-t0)/20*1000:.2f} ms",
      file=sys.stderr)

# packed variant, same harness
from ood_gan_inversion_tpu.ops.modulated import demod_scale
from ood_gan_inversion_tpu.ops import polyphase as pp

@jax.jit
def packed_stage(x, skip, w1, w2, wr, s1, s2, sr, n1p, n2p, rgbb):
    dt = x.dtype
    w1s = w1 * (1.0 / math.sqrt(CIN * 9))
    k1 = pp.upconv_blur_packed_kernel(w1s, BLUR).astype(dt)
    d1 = demod_scale(w1s, s1).astype(dt)
    z = pp.conv_packed(x * s1[:, None, None, :].astype(dt), k1)
    z = z * pp.tile_phase_major(d1)[:, None, None, :]
    b, h, w, _ = z.shape
    z = (z.reshape(b, h, w, 4, CMID) + 0.1 * n1p[..., None]).reshape(b, h, w, 4 * CMID)
    z = fused_leaky_relu(z, None)
    w2s = w2 * (1.0 / math.sqrt(CMID * 9))
    k2 = pp.conv3x3_packed_kernel(w2s).astype(dt)
    d2 = demod_scale(w2s, s2).astype(dt)
    z = pp.conv_packed(z * pp.tile_phase_major(s2.astype(dt))[:, None, None, :], k2)
    z = z * pp.tile_phase_major(d2)[:, None, None, :]
    z = (z.reshape(b, h, w, 4, CMID) + 0.1 * n2p[..., None]).reshape(b, h, w, 4 * CMID)
    z = fused_leaky_relu(z, None)
    wrs = wr * (1.0 / math.sqrt(CMID))
    k3 = pp.conv1x1_packed_kernel(wrs).astype(dt)
    rgb = pp.conv_packed(z * pp.tile_phase_major(sr.astype(dt))[:, None, None, :], k3, padding=0)
    rgb = rgb + pp.tile_phase_major(rgbb.reshape(3)).astype(dt)
    k4 = pp.skip_up_packed_kernel(BLUR, 3, dt)
    rgb = rgb + pp.conv_packed(skip, k4)
    return pp.unpack_depth_to_space(rgb, 3)

n1p = pp.pack_space_to_depth(args[8])[..., :4]
n2p = pp.pack_space_to_depth(args[9])[..., :4]
pargs = args[:8] + [n1p, n2p, args[10]]
out = packed_stage(*pargs)
jax.block_until_ready(out)
print("packed mean", float(jnp.mean(out)), file=sys.stderr)
for _ in range(3):
    out = packed_stage(*pargs)
jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(20):
    out = packed_stage(*pargs)
jax.block_until_ready(out)
print(f"packed stage enqueue-20: {(time.perf_counter()-t0)/20*1000:.2f} ms",
      file=sys.stderr)

# bf16 variants
args16 = [a.astype(jnp.bfloat16) for a in args]
pargs16 = args16[:8] + [n1p.astype(jnp.bfloat16), n2p.astype(jnp.bfloat16), args16[10]]
for name, fn, aa in (("naive bf16", naive_stage, args16),
                     ("packed bf16", packed_stage, pargs16)):
    out = fn(*aa); jax.block_until_ready(out)
    for _ in range(3): out = fn(*aa)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(20): out = fn(*aa)
    jax.block_until_ready(out)
    print(f"{name} enqueue-20: {(time.perf_counter()-t0)/20*1000:.2f} ms", file=sys.stderr)
