"""Component-level batch scaling at the collapsing 256px SAMM scale
((b,256,256,128) fp32 island, 2C=256): bare conv fp32 vs bf16, the moments
pass, the algebraic body0 with bf16-cast convs, and the in-pipeline-shaped
warp (grid_sample + alpha blend). Locates WHAT is batch-flat. In-graph scan
chaining per the axon timing protocol (PERF.md)."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from ood_gan_inversion_tpu.ops.pallas_kernels import (
    algebraic_alignnet_body0, _alignnet_coeffs)
from ood_gan_inversion_tpu.ops.grid_sample import grid_sample_bilinear

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)
N_CHAIN = 10
H, C = 256, 128
C2 = 2 * C

rs = np.random.RandomState(0)
g1 = jnp.asarray(rs.rand(C2) + 0.5, jnp.float32)
b1 = jnp.asarray(0.2 * rs.randn(C2), jnp.float32)
k1 = jnp.asarray(rs.randn(3, 3, C2, C2) * 0.05, jnp.float32)
al = jnp.asarray(rs.rand(C2) * 0.5, jnp.float32)
k2 = jnp.asarray(rs.randn(3, 3, C2, C2) * 0.05, jnp.float32)
g2 = jnp.asarray(rs.rand(C2) + 0.5, jnp.float32)
b2 = jnp.asarray(0.2 * rs.randn(C2), jnp.float32)


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
    print(f"{label:40s} {best*1000:8.3f} ms/op {best*1000/b:7.3f} ms/img "
          f"(compile {comp:.0f}s)", file=sys.stderr)


def conv(v, k):
    return lax.conv_general_dilated(
        v, k.astype(v.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def body0_bf16conv(s, t):
    """algebraic body0 with convs in bf16 (stats/affine fp32)."""
    c = s.shape[-1]
    s32, t32 = s.astype(jnp.float32), t.astype(jnp.float32)
    coeffs, h1, h2 = _alignnet_coeffs(s32, t32, g1, b1, True, 1e-5)
    as_, at_, b1h, ct_, b2h = [coeffs[:, i][:, None, None, :]
                               for i in range(5)]
    x1a = (as_ * s32 + at_ * t32 + b1h).astype(jnp.bfloat16)
    x1b = (ct_ * t32 + b2h).astype(jnp.bfloat16)
    z = conv(x1a, k1[:, :, :c]) + conv(x1b, k1[:, :, c:])
    z = jnp.where(z >= 0, z, al.reshape(1, 1, 1, -1).astype(z.dtype) * z)
    y2 = conv(z, k2).astype(jnp.float32)
    mu2 = jnp.mean(y2, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(y2 * y2, axis=(1, 2), keepdims=True)
    v2 = jnp.maximum(m2 - mu2 * mu2, 0.0)
    kk = jax.lax.rsqrt(v2 + 1e-5) * g2
    bb = b2 - mu2 * kk
    h = jnp.concatenate([h1, h2], axis=-1)
    return (y2 * kk + bb + h).astype(s.dtype)


SEL = os.environ.get("SEL", "convf32,convbf16,moments,body0bf,warp")
for b in (1, 4, 8):
    s = jax.device_put(jnp.asarray(rs.randn(b, H, H, C) * 0.5, jnp.float32),
                       tpu)
    t = jax.device_put(jnp.asarray(rs.randn(b, H, H, C) * 0.5, jnp.float32),
                       tpu)
    x2 = jax.device_put(jnp.asarray(rs.randn(b, H, H, C2) * 0.5, jnp.float32),
                        tpu)
    kk1 = jnp.asarray(rs.randn(3, 3, C2, C2) * 0.05)
    flow = jax.device_put(
        jnp.asarray(rs.randn(b, H, H, 3) * 0.05, jnp.float32), tpu)

    if "convf32" in SEL:
        bench(f"conv3x3 2C={C2} fp32 b={b}",
              lambda v: conv(v, kk1.astype(jnp.float32)), x2)
    if "convbf16" in SEL:
        bench(f"conv3x3 2C={C2} bf16 b={b}",
              lambda v: conv(v, kk1.astype(jnp.bfloat16)),
              x2.astype(jnp.bfloat16))
    if "moments" in SEL:
        bench(f"moments+affine coeffs b={b}",
              lambda sv: _alignnet_coeffs(sv, t[:sv.shape[0]], g1, b1,
                                          True, 1e-5)[0], s)
    if "body0bf" in SEL:
        bench(f"algebraic body0 bf16-convs b={b}",
              lambda sv: body0_bf16conv(sv, t[:sv.shape[0]]), s)
    if "warp" in SEL:
        lin = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)
        base = jnp.stack(jnp.meshgrid(lin, lin, indexing="xy"), axis=-1)

        def warp(tv, fl):
            grid = base[None] + fl[..., :2]
            w = grid_sample_bilinear(tv, grid)
            a = jax.nn.sigmoid(fl[..., 2:3])
            return w * a + tv * (1.0 - a)

        bench(f"warp+blend C={C} fp32 b={b}", warp, t, flow)
