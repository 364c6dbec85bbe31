"""Isolate the 1024px generator stage: naive vs packed, fp32 vs bf16."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0]), math
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.ops.modulated import modulated_conv2d, demod_scale
from ood_gan_inversion_tpu.ops.upfirdn2d import make_kernel, upsample2x
from ood_gan_inversion_tpu.ops.fused_act import fused_leaky_relu
from ood_gan_inversion_tpu.ops import polyphase as pp

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)

BLUR = make_kernel((1, 3, 3, 1))
CIN, CMID = 64, 32
H = 512
rs = np.random.RandomState(0)

def timeit(fn, *args, iters=20, warmup=3, label=""):
    # vary the first arg per call — identical (fn, args) dispatches appear to
    # be deduplicated/cached by the axon tunnel and time as ~0 ms
    variants = [jax.device_put(args[0] + jnp.asarray(i, args[0].dtype), tpu)
                for i in range(iters)]
    t0 = time.time(); out = fn(*args); jax.block_until_ready(out)
    c = time.time() - t0
    for i in range(warmup): out = fn(variants[i], *args[1:])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters): out = fn(variants[i], *args[1:])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:52s} {dt:8.2f} ms   (compile {c:.0f}s)", file=sys.stderr)
    return dt

def naive_stage(x, skip, w1, w2, wr, s1, s2, sr, n1, n2, rgbb):
    blur = jnp.asarray(BLUR)
    z = modulated_conv2d(x, w1, s1, True, upsample=True, blur_kernel=blur)
    z = fused_leaky_relu(z + 0.1 * n1, None)
    z = modulated_conv2d(z, w2, s2, True, blur_kernel=blur)
    z = fused_leaky_relu(z + 0.1 * n2, None)
    rgb = modulated_conv2d(z, wr, sr, False) + rgbb
    return rgb + upsample2x(skip, blur)

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

args = dict(
    x=rs.randn(1, H, H, CIN).astype(np.float32),
    skip=rs.randn(1, H, H, 3).astype(np.float32),
    w1=rs.randn(3, 3, CIN, CMID).astype(np.float32),
    w2=rs.randn(3, 3, CMID, CMID).astype(np.float32),
    wr=rs.randn(1, 1, CMID, 3).astype(np.float32),
    s1=(rs.rand(1, CIN) + 0.5).astype(np.float32),
    s2=(rs.rand(1, CMID) + 0.5).astype(np.float32),
    sr=(rs.rand(1, CMID) + 0.5).astype(np.float32),
    rgbb=rs.randn(1, 1, 1, 3).astype(np.float32),
)
n1 = rs.randn(1, 2 * H, 2 * H, 1).astype(np.float32)
n2 = rs.randn(1, 2 * H, 2 * H, 1).astype(np.float32)

for dtname, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
    a = {k: jax.device_put(jnp.asarray(v, dt), tpu) for k, v in args.items()}
    n1d = jax.device_put(jnp.asarray(n1, dt), tpu)
    n2d = jax.device_put(jnp.asarray(n2, dt), tpu)
    n1p = pp.pack_space_to_depth(n1d)[..., :4]
    n2p = pp.pack_space_to_depth(n2d)[..., :4]
    f_n = jax.jit(lambda *xs: naive_stage(*xs), device=tpu)
    f_p = jax.jit(lambda *xs: packed_stage(*xs), device=tpu)
    r_n = timeit(f_n, a["x"], a["skip"], a["w1"], a["w2"], a["wr"], a["s1"],
                 a["s2"], a["sr"], n1d, n2d, a["rgbb"],
                 label=f"1024px stage naive {dtname}")
    r_p = timeit(f_p, a["x"], a["skip"], a["w1"], a["w2"], a["wr"], a["s1"],
                 a["s2"], a["sr"], n1p, n2p, a["rgbb"],
                 label=f"1024px stage packed {dtname}")
