"""Pallas TPU kernels for the hot decode path.

fused_conv3x3_act: a 3x3 conv with the whole modulated-conv epilogue fused —
input style scale, fp32 MXU accumulation, output demod scale, phase-packed
noise injection, bias, leaky-ReLU*sqrt(2) — computed in full-width row bands
with everything resident in VMEM. XLA runs each conv of the packed generator
pair (ops/polyphase.py) with separate HBM round trips for the elementwise
epilogue (~6 ms per pair at 512^2x128 bf16 on one v5e); the fused kernel
reads x and writes the activated output exactly once.

fused_packed_pair: the phase-packed generator layer pair = two
fused_conv3x3_act calls. Its backward pass is NOT hand-written: a custom_vjp
differentiates the identical XLA formulation (packed_pair_reference) — a
rematerialization, consistent with the decode-stage remat policy
(archs/common.py). Forward/reference parity is pinned in
tests/test_pallas_kernels.py (interpret mode on CPU).

Replaces (together with ops/polyphase.py) the role of the reference CUDA
kernels upfirdn2d + fused_bias_act on the >=512px stages
(src/ops/op/upfirdn2d_kernel.cu:52-137, fused_bias_act_kernel.cu:36-47).

Layout/lowering notes (hard-won):
  * Element windows must have in-bounds starts (Mosaic has no low padding):
    spatial halos are zero-PRE-padded by the caller.
  * Every dim of a block must be Element when any is.
  * W stays un-tiled (full rows): the last-two-dims (W, C) blocks then equal
    the array dims, sidestepping the (8, 128) divisibility constraint, and
    the only overlapping windows are along H (band halo).
  * Noise is broadcast phase->packed-channels with a one-hot matmul (E),
    not a sub-32-bit reshape/repeat (Mosaic cannot lower those).
  * The dy tap loop is a fori_loop (dynamic slice on H, the 3rd-minor dim,
    is cheap) so tap patches are not all live at once — with 9 unrolled
    taps the kernel blew past the 16 MB scoped-VMEM limit.
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# OGI_SAMM_CONCAT1=1: algebraic body0 conv1 as ONE 2C-in conv (see below)
_CONCAT1 = os.environ.get("OGI_SAMM_CONCAT1", "0") == "1"
# OGI_SAMM_CONV_BF16=1: materialize the body0 conv operands (x1, z, weights)
# in bf16 with fp32 MXU accumulation. XLA already runs fp32 convs as bf16
# MXU passes, so this changes only the HBM bytes of the conv reads (fp32
# conv3x3 4.24 ms vs bf16 3.59 at the (1,256,256,128)->256 scale, PERF.md);
# all InstanceNorm statistics / affine coefficients stay fp32.
_CONV_BF16 = os.environ.get("OGI_SAMM_CONV_BF16", "0") == "1"
# OGI_SAMM_CONV_MATMUL=1: evaluate the body0 3x3 convs as ONE im2col
# dot_general ((B*H*W, 9*Ci) x (9*Ci, Co)) instead of lax.conv — the exact
# same dot products in a single MXU-shaped contraction. Targets the b=1
# conv under-utilization (the standalone 2C=256@256px conv runs at ~11% of
# MXU peak); costs a 9x materialization of the input taps in HBM
# (~0.4 ms/conv of extra traffic at 256px). A/B knob, default per PERF.md.
_CONV_MATMUL = os.environ.get("OGI_SAMM_CONV_MATMUL", "0") == "1"
# OGI_SAMM_CONV_BATCHFOLD: fold SMALL batches into the conv's HEIGHT axis
# with zero-row separators — exact pad-1 semantics per image (each image's
# boundary rows see exactly the zero rows per-image padding would give).
# Built against the r4 b=2/4 collapse (body0 convs cost 11.6 ms/img at
# b=2 vs 6.9 at b=1) on the hypothesis that b=1 gets a better conv
# schedule — REFUTED by the A/B: folding measured 36.98 vs 31.66 ms/img
# at b=2 (PERF.md r4), i.e. the b=1 advantage is shape-, not
# batch-schedule-, driven. Default OFF; "auto" folds 2 <= b <= 4, "1"
# folds every b > 1 (bit-exact either way, tested).
_CONV_BATCHFOLD = os.environ.get("OGI_SAMM_CONV_BATCHFOLD", "0")

from .fused_act import fused_leaky_relu

SQRT2 = math.sqrt(2.0)


def _lrelu(x, slope=0.2):
    return SQRT2 * jnp.where(x >= 0, x, slope * x)


def _conv_band_kernel(x_ref, n_ref, k_ref, do_ref, b_ref, e_ref,
                      o_ref, *, band: int):
    """One (band, W) output band. Blocks:
    x (1, band+2, W+2, Ci) [pre-scaled by the style scale and pre-padded],
    n (1, band, W, 4), k (3, 3, Ci, Co), do/b (1, Co), e (4, Co),
    o (1, band, W, Co).

    Taps are statically unrolled (Mosaic cannot lower dynamic_slice on
    values) and sliced straight from the input ref so only one tap patch is
    live at a time."""
    f32 = jnp.float32
    ci = x_ref.shape[-1]
    co = k_ref.shape[-1]
    w = o_ref.shape[2]
    t = band

    acc = jnp.zeros((t * w, co), f32)
    for dy in range(3):
        for dx in range(3):
            patch = x_ref[0, dy:dy + t, dx:dx + w, :].reshape(t * w, ci)
            acc = acc + jnp.dot(patch, k_ref[dy, dx],
                                preferred_element_type=f32)
    acc = acc * do_ref[0].astype(f32)
    noise = jnp.dot(n_ref[0].reshape(t * w, 4).astype(f32),
                    e_ref[:].astype(f32), preferred_element_type=f32)
    out = _lrelu(acc + noise + b_ref[0].astype(f32))
    o_ref[0] = out.astype(o_ref.dtype).reshape(t, w, co)


def _phase_onehot(c4: int, dtype) -> jnp.ndarray:
    """E (4, C4) with E[p, p*Cmid+o] = 1 (phase-major packed layout)."""
    cmid = c4 // 4
    e = jnp.zeros((4, c4), dtype)
    for p in range(4):
        e = e.at[p, p * cmid:(p + 1) * cmid].set(1.0)
    return e


def pick_band(h: int, w: int, ci: int, co: int, itemsize: int = 2,
              budget: int = 9 * 2 ** 20):
    """Largest band whose working set (x band + fp32 accumulator + live tap
    patches + output) fits the scoped-VMEM budget."""
    for t in (32, 16, 8, 4):
        if h % t:
            continue
        est = ((t + 2) * (w + 2) * ci * itemsize      # x band
               + t * w * co * 4                        # fp32 accumulator
               + 3 * t * w * ci * itemsize             # live tap patches
               + 2 * t * w * co * itemsize)            # out + stores
        if est <= budget:
            return t
    return None


def fused_conv3x3_act(x, noise4, k, s_in, d_out, bias, band: int,
                      interpret: bool = False):
    """lrelu(conv3x3(x * s_in) * d_out + phase_broadcast(noise4) + bias).

    x: (B, H, W, Ci); noise4: (B, H, W, 4) packed-phase noise (pre-scaled);
    k: (3, 3, Ci, Co); s_in (B, Ci); d_out (B, Co); bias (B, Co).
    """
    bsz, h, w, ci = x.shape
    co = k.shape[-1]
    t = band
    if t is None:
        raise ValueError(
            f"fused_conv3x3_act: no row band of ({h},{w},{ci}->{co}) fits the "
            "scoped-VMEM budget — gate calls on pallas_pair_supported()")
    assert h % t == 0, (h, t)
    e = _phase_onehot(co, jnp.float32)
    # pre-scale + pre-pad in XLA (one fused pass); the kernel then reads tap
    # patches straight from the ref
    xp = jnp.pad(x * s_in[:, None, None, :].astype(x.dtype),
                 [(0, 0), (1, 1), (1, 1), (0, 0)])

    elem = lambda sizes: tuple(pl.Element(s) for s in sizes)
    flops = 2 * 9 * bsz * h * w * ci * co
    return pl.pallas_call(
        functools.partial(_conv_band_kernel, band=t),
        grid=(bsz, h // t),
        in_specs=[
            pl.BlockSpec(elem((1, t + 2, w + 2, ci)),
                         lambda b, i: (b, i * t, 0, 0)),
            pl.BlockSpec(elem((1, t, w, 4)), lambda b, i: (b, i * t, 0, 0)),
            pl.BlockSpec((3, 3, ci, co), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, co), lambda b, i: (b, 0)),
            pl.BlockSpec((1, co), lambda b, i: (b, 0)),
            pl.BlockSpec((4, co), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(elem((1, t, w, co)),
                               lambda b, i: (b, i * t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=(x.size + bsz * h * w * co) * x.dtype.itemsize),
        interpret=interpret,
    )(xp, noise4, k, d_out, bias, e)


def _stage_band_kernel(x_ref, n1_ref, n2_ref, skip_ref, k1_ref, d1_ref,
                       b1_ref, s2_ref, k2_ref, d2_ref, b2_ref, k3_ref,
                       b3_ref, k4_ref, e_ref, rgb_ref, z2_ref, z_scr,
                       *, band: int):
    """One (band, W) band of a FULL packed generator stage:
    conv1(+demod+noise+bias+lrelu, input pre-scaled by s1) ->
    conv2(+s2+demod+noise+bias+lrelu) -> toRGB(1x1, s_r pre-folded into k3)
    + packed skip upsample. The conv1 activation lives in a VMEM scratch
    (z_scr) so conv2 taps slice a ref, not a value.

    Blocks: x (1, band+4, W+4, C1) [pre-scaled+pre-padded 2],
    n1 (1, band+2, W+2, 4) [pre-padded 1], n2 (1, band, W, 4),
    skip (1, band+2, W+2, 3) [pre-padded 1], k1 (3,3,C1,C4),
    k2 (3,3,C4,C4), k3 (1, C4, 12) [per-sample, s_r folded], k4 (3,3,3,12),
    d1/b1/s2/d2/b2 (1, C4), b3 (1, 12), e (4, C4);
    outputs rgb (1, band, W, 12), z2 (1, band, W, C4)."""
    f32 = jnp.float32
    c1 = x_ref.shape[-1]
    c4 = k1_ref.shape[-1]
    w = rgb_ref.shape[2]
    t = band
    th = t + 2

    i = pl.program_id(1)
    ht = pl.num_programs(1) * t

    # conv1 over the halo-1 region
    acc = jnp.zeros((th * (w + 2), c4), f32)
    for dy in range(3):
        for dx in range(3):
            patch = x_ref[0, dy:dy + th, dx:dx + w + 2, :].reshape(
                th * (w + 2), c1)
            acc = acc + jnp.dot(patch, k1_ref[dy, dx],
                                preferred_element_type=f32)
    acc = acc * d1_ref[0].astype(f32)
    n1 = jnp.dot(n1_ref[0].reshape(th * (w + 2), 4).astype(f32),
                 e_ref[:].astype(f32), preferred_element_type=f32)
    z = _lrelu(acc + n1 + b1_ref[0].astype(f32)) * s2_ref[0].astype(f32)
    z = z.astype(x_ref.dtype).reshape(th, w + 2, c4)
    # conv2's zero padding: the zact ring outside the array must be 0
    sh = (th, w + 2, 1)
    rows = lax.broadcasted_iota(jnp.int32, sh, 0) + i * t - 1
    cols = lax.broadcasted_iota(jnp.int32, sh, 1) - 1
    valid = (rows >= 0) & (rows < ht) & (cols >= 0) & (cols < w)
    z_scr[:] = jnp.where(valid, z, jnp.zeros_like(z))

    # conv2 on the packed activation (taps slice the scratch ref)
    acc2 = jnp.zeros((t * w, c4), f32)
    for dy in range(3):
        for dx in range(3):
            patch = z_scr[dy:dy + t, dx:dx + w, :].reshape(t * w, c4)
            acc2 = acc2 + jnp.dot(patch, k2_ref[dy, dx],
                                  preferred_element_type=f32)
    acc2 = acc2 * d2_ref[0].astype(f32)
    n2 = jnp.dot(n2_ref[0].reshape(t * w, 4).astype(f32),
                 e_ref[:].astype(f32), preferred_element_type=f32)
    z2 = _lrelu(acc2 + n2 + b2_ref[0].astype(f32))
    z2c = z2.astype(z2_ref.dtype)
    z2_ref[0] = z2c.reshape(t, w, c4)

    # toRGB (s_r folded into k3) + packed skip upsample
    rgb = jnp.dot(z2c.reshape(t * w, c4), k3_ref[0],
                  preferred_element_type=f32)
    rgb = rgb + b3_ref[0].astype(f32)
    for dy in range(3):
        for dx in range(3):
            patch = skip_ref[0, dy:dy + t, dx:dx + w, :].reshape(t * w, 3)
            rgb = rgb + jnp.dot(patch, k4_ref[dy, dx],
                                preferred_element_type=f32)
    rgb_ref[0] = rgb.astype(rgb_ref.dtype).reshape(t, w, 12)


def fused_packed_stage_pallas(x, n1, n2, skip, k1, s1, d1, b1, k2, s2, d2,
                              b2, k3sr, b3, k4, band: int,
                              interpret: bool = False):
    """Whole packed stage in one Pallas call. Args mirror _stage_band_kernel;
    here x is unpadded/unscaled (s1 applied and pads added in one XLA pass),
    k3sr is the per-sample (B, C4, 12) toRGB kernel with the style scale
    already folded, b3 (B, 12), k4 (3,3,3,12). skip may be None (first
    stage). Returns (rgb (B,H,W,12), z2 (B,H,W,C4))."""
    bsz, h, w, c1 = x.shape
    c4 = k1.shape[-1]
    t = band
    assert h % t == 0, (h, t)
    e = _phase_onehot(c4, jnp.float32)
    xp = jnp.pad(x * s1[:, None, None, :].astype(x.dtype),
                 [(0, 0), (2, 2), (2, 2), (0, 0)])
    if skip is None:
        skip = jnp.zeros((bsz, h, w, 3), x.dtype)
    skp = jnp.pad(skip, [(0, 0), (1, 1), (1, 1), (0, 0)])
    n1p = jnp.pad(n1, [(0, 0), (1, 1), (1, 1), (0, 0)])

    elem = lambda sizes: tuple(pl.Element(s) for s in sizes)
    vec = lambda c: pl.BlockSpec((1, c), lambda b, i: (b, 0))
    flops = 2 * bsz * h * w * (9 * c1 * c4 + 9 * c4 * c4 + c4 * 12 + 9 * 36)
    rgb, z2 = pl.pallas_call(
        functools.partial(_stage_band_kernel, band=t),
        grid=(bsz, h // t),
        in_specs=[
            pl.BlockSpec(elem((1, t + 4, w + 4, c1)),
                         lambda b, i: (b, i * t, 0, 0)),
            pl.BlockSpec(elem((1, t + 2, w + 2, 4)),
                         lambda b, i: (b, i * t, 0, 0)),
            pl.BlockSpec(elem((1, t, w, 4)), lambda b, i: (b, i * t, 0, 0)),
            pl.BlockSpec(elem((1, t + 2, w + 2, 3)),
                         lambda b, i: (b, i * t, 0, 0)),
            pl.BlockSpec((3, 3, c1, c4), lambda b, i: (0, 0, 0, 0)),
            vec(c4), vec(c4), vec(c4),
            pl.BlockSpec((3, 3, c4, c4), lambda b, i: (0, 0, 0, 0)),
            vec(c4), vec(c4),
            pl.BlockSpec((1, c4, 12), lambda b, i: (b, 0, 0)),
            vec(12),
            pl.BlockSpec((3, 3, 3, 12), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((4, c4), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(elem((1, t, w, 12)), lambda b, i: (b, i * t, 0, 0)),
            pl.BlockSpec(elem((1, t, w, c4)), lambda b, i: (b, i * t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, 12), x.dtype),
            jax.ShapeDtypeStruct((bsz, h, w, c4), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((t + 2, w + 2, c4), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=(x.size + 2 * bsz * h * w * c4) * x.dtype.itemsize),
        interpret=interpret,
    )(xp, n1p, n2, skp, k1, d1, b1, s2, k2, d2, b2, k3sr, b3, k4, e)
    return rgb, z2


def _pair_pallas(x, n1, n2, k1, s1, d1, b1, k2, s2, d2, b2,
                 interpret: bool = False):
    c4 = k1.shape[-1]
    _, h, w, c1 = x.shape
    it = x.dtype.itemsize
    band1 = pick_band(h, w, c1, c4, it)
    band2 = pick_band(h, w, c4, c4, it)
    z = fused_conv3x3_act(x, n1, k1, s1, d1, b1, band1, interpret)
    return fused_conv3x3_act(z, n2, k2, s2, d2, b2, band2, interpret)


def packed_pair_reference(x, n1, n2, k1, s1, d1, b1, k2, s2, d2, b2):
    """XLA formulation of the same op (the polyphase packed chain); used as
    the custom_vjp backward (rematerialized) and as the test oracle."""
    def conv(v, k):
        return lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    c4 = k1.shape[-1]
    cmid = c4 // 4
    b_, h, w, _ = x.shape

    def noise_add(z, n):
        return (z.reshape(b_, h, w, 4, cmid) + n[..., None]
                ).reshape(b_, h, w, c4)

    z = conv(x * s1[:, None, None, :].astype(x.dtype), k1)
    z = z * d1[:, None, None, :].astype(z.dtype)
    z = fused_leaky_relu(noise_add(z, n1), b1)
    z2 = conv(z * s2[:, None, None, :].astype(z.dtype), k2)
    z2 = z2 * d2[:, None, None, :].astype(z2.dtype)
    return fused_leaky_relu(noise_add(z2, n2), b2)


def pallas_pair_supported(h: int, w: int, c1: int, c4: int,
                          itemsize: int = 2) -> bool:
    return (pick_band(h, w, c1, c4, itemsize) is not None
            and pick_band(h, w, c4, c4, itemsize) is not None)


@jax.custom_vjp
def fused_packed_pair(x, n1, n2, k1, s1, d1, b1, k2, s2, d2, b2):
    """Fused phase-packed generator layer pair (see module docstring).

    Args:
      x: (B, H, W, C1) coarse input (already unpacked channels).
      n1: (B, H, W, 4) phase-packed noise for conv1's output, PRE-SCALED by
        the NoiseInjection weight; n2 likewise for conv2.
      k1: (3, 3, C1, C4) packed upconv+blur kernel (upconv_blur_packed_kernel
        of the he-scaled weight); s1 (B, C1) style scale; d1 (B, C4) packed
        demod; b1 (C4,) packed lrelu bias; k2/s2/d2/b2 the conv2 equivalents.
    Returns: (B, H, W, C4) activated packed output of the pair.
    """
    args = (x, n1, n2, k1, s1, d1,
            jnp.broadcast_to(b1[None], (x.shape[0], b1.shape[0])),
            k2, s2, d2,
            jnp.broadcast_to(b2[None], (x.shape[0], b2.shape[0])))
    # Mosaic only lowers for TPU; pick interpret mode per LOWERING platform
    # (flax init may trace this on CPU while the run targets the TPU).
    return jax.lax.platform_dependent(
        *args,
        cpu=functools.partial(_pair_pallas, interpret=True),
        default=_pair_pallas)


def _fpp_fwd(x, n1, n2, k1, s1, d1, b1, k2, s2, d2, b2):
    out = fused_packed_pair(x, n1, n2, k1, s1, d1, b1, k2, s2, d2, b2)
    return out, (x, n1, n2, k1, s1, d1, b1, k2, s2, d2, b2)


def _fpp_bwd(res, g):
    _, vjp = jax.vjp(packed_pair_reference, *res)
    return vjp(g)


fused_packed_pair.defvjp(_fpp_fwd, _fpp_bwd)


def packed_stage_reference(x, n1, n2, skip, k1, s1, d1, b1, k2, s2, d2, b2,
                           k3sr, b3, k4):
    """XLA formulation of the full packed stage (pair + toRGB + packed skip
    upsample); custom_vjp backward and test oracle. k3sr: (B, C4, 12) with
    the toRGB style scale folded; b3 (12,); k4 (3, 3, 3, 12)."""
    z2 = packed_pair_reference(x, n1, n2, k1, s1, d1, b1, k2, s2, d2, b2)
    rgb = jnp.einsum("bhwc,bco->bhwo", z2, k3sr.astype(z2.dtype))
    rgb = rgb + b3.astype(rgb.dtype)
    rgb = rgb + lax.conv_general_dilated(
        skip, k4.astype(skip.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return rgb, z2


def _stage_band(h: int, w: int, c1: int, c4: int, itemsize: int = 2,
                budget: int = 10 * 2 ** 20):
    """Band size for the whole-stage kernel, PROBE-CALIBRATED
    (tools/prof/probe_stage_vmem.py, real compiler): at the packed-tail
    shapes band 4 is the only configuration that both lowers and fits —
    band 8 crashes the compiler at (256,128,256); sub-128 channel counts
    (the 1024-out stage's c1=64) fail Mosaic's block lowering outright at
    any band. The VMEM estimate below gates marginal shapes on top."""
    for t in (4,):
        if h % t:
            continue
        est = ((t + 4) * (w + 4) * c1 * itemsize        # x band
               + (t + 2) * (w + 2) * c4 * (itemsize + 4)  # zact scratch+acc1
               + t * w * c4 * (4 + 2 * itemsize)          # acc2 + z2 out
               + 3 * t * w * max(c1, c4) * itemsize)      # live patches
        if est <= budget:
            return t
    return None


def pallas_stage_supported(h: int, w: int, c1: int, c4: int,
                           itemsize: int = 2) -> bool:
    """TPU-lowering gate for the whole-stage kernel. On top of the band/VMEM
    estimate this requires 128-aligned channel counts: the probe
    (tools/prof/probe_stage_vmem.py) showed sub-128 c1 (the 1024-out
    stage's c1=64) fails Mosaic's block lowering at any band, and band 8
    crashes the compiler even at the 128-aligned (256,128,256) shape —
    _stage_band therefore only offers band 4. Interpret-mode (CPU tests)
    bypasses this gate and may use any shape."""
    return (c1 % 128 == 0 and c4 % 128 == 0
            and _stage_band(h, w, c1, c4, itemsize) is not None)


@jax.custom_vjp
def fused_packed_stage(x, n1, n2, skip, k1, s1, d1, b1, k2, s2, d2, b2,
                       k3sr, b3, k4):
    """Whole phase-packed generator stage in one Pallas kernel: conv pair
    (as fused_packed_pair) + toRGB + packed FIR skip upsample. Returns
    (rgb (B,H,W,12), z2 (B,H,W,C4)). Backward rematerializes through
    packed_stage_reference."""
    bsz = x.shape[0]
    band = _stage_band(x.shape[1], x.shape[2], x.shape[-1], k1.shape[-1],
                       jnp.dtype(x.dtype).itemsize)
    args = (x, n1, n2, skip, k1, s1, d1,
            jnp.broadcast_to(b1[None], (bsz, b1.shape[0])),
            k2, s2, d2,
            jnp.broadcast_to(b2[None], (bsz, b2.shape[0])),
            k3sr, jnp.broadcast_to(b3[None], (bsz, 12)), k4)

    def run(x, n1, n2, skip, k1, s1, d1, b1, k2, s2, d2, b2, k3sr, b3, k4,
            interpret=False):
        return fused_packed_stage_pallas(
            x, n1, n2, skip, k1, s1, d1, b1, k2, s2, d2, b2, k3sr, b3, k4,
            band, interpret)

    return jax.lax.platform_dependent(
        *args,
        cpu=functools.partial(run, interpret=True),
        default=run)


def _fps_fwd(*args):
    out = fused_packed_stage(*args)
    return out, args


def _fps_bwd(res, g):
    _, vjp = jax.vjp(packed_stage_reference, *res)
    return vjp(g)


fused_packed_stage.defvjp(_fps_fwd, _fps_bwd)


# ---------------------------------------------------------------- SAMM convs

def _conv_act_band_kernel(x_ref, k_ref, a_ref, o_ref, *, band: int, act: str):
    """Plain 3x3 conv + optional activation, band-tiled (the SAMM AlignNet
    hot conv: src/ops/SAMM/helpers.py:58-60 runs 2C->2C 3x3 convs between
    InstanceNorms/PReLUs that XLA leaves at ~15% MXU efficiency).
    Blocks: x (1, band+2, W+2, Ci) [pre-padded], k (3, 3, Ci, Co),
    a (1, Co) PReLU slope (ignored unless act == 'prelu'),
    o (1, band, W, Co)."""
    f32 = jnp.float32
    ci = x_ref.shape[-1]
    w = o_ref.shape[2]
    t = band
    co = k_ref.shape[-1]

    acc = jnp.zeros((t * w, co), f32)
    for dy in range(3):
        for dx in range(3):
            patch = x_ref[0, dy:dy + t, dx:dx + w, :].reshape(t * w, ci)
            acc = acc + jnp.dot(patch, k_ref[dy, dx],
                                preferred_element_type=f32)
    if act == "prelu":
        a = a_ref[0].astype(f32)
        out = jnp.where(acc >= 0, acc, a * acc)
    elif act == "lrelu":
        out = _lrelu(acc)
    else:
        out = acc
    o_ref[0] = out.astype(o_ref.dtype).reshape(t, w, co)


def _conv3x3_act_pallas(x, k, alpha, act: str, band: int,
                        interpret: bool = False):
    bsz, h, w, ci = x.shape
    co = k.shape[-1]
    t = band
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    elem = lambda sizes: tuple(pl.Element(s) for s in sizes)
    return pl.pallas_call(
        functools.partial(_conv_act_band_kernel, band=t, act=act),
        grid=(bsz, h // t),
        in_specs=[
            pl.BlockSpec(elem((1, t + 2, w + 2, ci)),
                         lambda b, i: (b, i * t, 0, 0)),
            pl.BlockSpec((3, 3, ci, co), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, co), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(elem((1, t, w, co)),
                               lambda b, i: (b, i * t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * h * w * ci * co, transcendentals=0,
            bytes_accessed=(x.size + bsz * h * w * co) * x.dtype.itemsize),
        interpret=interpret,
    )(xp, k, alpha[None])


def conv3x3_act_reference(x, k, alpha, act: str):
    """XLA oracle / custom_vjp backward for conv3x3_act."""
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if act == "prelu":
        a = alpha.reshape((1, 1, 1, -1)).astype(y.dtype)
        return jnp.where(y >= 0, y, a * y)
    if act == "lrelu":
        return SQRT2 * jnp.where(y >= 0, y, 0.2 * y)
    return y


def conv3x3_act_supported(h: int, w: int, ci: int, co: int,
                          itemsize: int = 2) -> bool:
    # the (3,3,Ci,Co) weight is blocked whole into VMEM: at the deep SAMM
    # scales (2C=1024) it alone is 19-38 MB and the kernel cannot compile
    weight_bytes = 9 * ci * co * itemsize
    return (ci >= 64 and co >= 64 and weight_bytes <= 3 * 2 ** 20
            and pick_band(h, w, ci, co, itemsize) is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_act(x, k, alpha, act: str = "prelu"):
    """Fused padding-1 3x3 conv + activation Pallas kernel with an XLA
    rematerializing backward. alpha: (Co,) PReLU slopes (pass zeros when
    act != 'prelu'). Falls back to the XLA reference when no VMEM band fits
    (callers should still gate on conv3x3_act_supported for perf intent)."""
    band = pick_band(x.shape[1], x.shape[2], x.shape[-1], k.shape[-1],
                     jnp.dtype(x.dtype).itemsize)
    if band is None:
        return conv3x3_act_reference(x, k, alpha, act)
    run = functools.partial(_conv3x3_act_pallas, act=act, band=band)
    return jax.lax.platform_dependent(
        x, k, alpha,
        cpu=functools.partial(run, interpret=True),
        default=run)


def _c3a_fwd(x, k, alpha, act):
    return conv3x3_act(x, k, alpha, act), (x, k, alpha)


def _c3a_bwd(act, res, g):
    _, vjp = jax.vjp(lambda *a: conv3x3_act_reference(*a, act), *res)
    return vjp(g)


conv3x3_act.defvjp(_c3a_fwd, _c3a_bwd)


# -------------------------------------------------- fused AlignNet body0
#
# The SAMM AlignNet head (SAMM/helpers.py:85-109 feeding the scaleNshiftBlock
# bottleneck at :58-60) is: IN(source), IN(target) -> concat([s-t, t]) ->
# IN_affine -> conv3x3(2C->2C) -> PReLU -> conv3x3(2C->2C) -> IN_affine ->
# + concat shortcut. In XLA every arrow is an HBM round trip of a 2C-channel
# tensor (67 MB at 256px fp32 — PERF.md round-1 decomposition). The fused op
# collapses the whole pre-conv normalization algebra into 5 per-(batch,
# channel) scalars (every IN/concat step is per-channel affine given the
# input moments), so the chain becomes:
#   1. ONE XLA pass over (s, t): the 5 joint moments E[s],E[t],E[s2],E[t2],
#      E[st] -> the affine coefficients.
#   2. Pallas kernel A: build x1 = norm1(concat) in VMEM from the
#      coefficients (the 2C concat tensor never hits HBM), conv1 + PReLU.
#   3. Pallas kernel B: conv2 + the output moment partials (norm2's stats,
#      accumulated in fp32 on the MXU accumulator — no extra pass).
#   4. ONE XLA epilogue pass: norm2 affine + the concat-shortcut add
#      (recomputed elementwise from s, t — cheaper than storing it).
# The backward rematerializes through the XLA reference (same policy as
# fused_packed_pair). On TPU the kernels run bf16 tap dots with fp32
# accumulation — identical precision to XLA's default fp32-conv lowering the
# unfused path uses.


def _an_conv1_kernel(s_ref, t_ref, c_ref, k_ref, a_ref, z_ref, x_scr,
                     *, band: int):
    """Kernel A: x1 from affine coefficients (VMEM-only), conv1, PReLU.
    Blocks: s/t (1, band+2, W+2, C) [pre-padded 1], c (1, 5, C) fp32
    [as, at, b1, ct, b2], k (3, 3, 2C, 2C), a (1, 2C) PReLU slopes,
    z out (1, band, W, 2C); x_scr VMEM (band+2, W+2, 2C)."""
    f32 = jnp.float32
    c = s_ref.shape[-1]
    w = z_ref.shape[2]
    t = band
    i = pl.program_id(1)
    ht = pl.num_programs(1) * t

    sv = s_ref[0].astype(f32)
    tv = t_ref[0].astype(f32)
    as_ = c_ref[0, 0].astype(f32)
    at_ = c_ref[0, 1].astype(f32)
    b1_ = c_ref[0, 2].astype(f32)
    ct_ = c_ref[0, 3].astype(f32)
    b2_ = c_ref[0, 4].astype(f32)
    h1 = sv * as_ + tv * at_ + b1_
    h2 = tv * ct_ + b2_
    # conv1's zero padding applies to x1: the ring outside the array is 0,
    # NOT the affine image of the zero-padded s/t
    sh = (t + 2, w + 2, 1)
    rows = lax.broadcasted_iota(jnp.int32, sh, 0) + i * t - 1
    cols = lax.broadcasted_iota(jnp.int32, sh, 1) - 1
    valid = (rows >= 0) & (rows < ht) & (cols >= 0) & (cols < w)
    zero = jnp.zeros_like(h1)
    x_scr[:, :, :c] = jnp.where(valid, h1, zero).astype(x_scr.dtype)
    x_scr[:, :, c:] = jnp.where(valid, h2, zero).astype(x_scr.dtype)

    c2 = 2 * c
    acc = jnp.zeros((t * w, c2), f32)
    for dy in range(3):
        for dx in range(3):
            patch = x_scr[dy:dy + t, dx:dx + w, :].reshape(t * w, c2)
            acc = acc + jnp.dot(patch, k_ref[dy, dx],
                                preferred_element_type=f32)
    a = a_ref[0].astype(f32)
    out = jnp.where(acc >= 0, acc, a * acc)
    z_ref[0] = out.astype(z_ref.dtype).reshape(t, w, c2)


def _an_conv2_kernel(z_ref, k_ref, y_ref, p_ref, *, band: int):
    """Kernel B: conv2 + fp32 moment partials of the output (for norm2).
    Blocks: z (1, band+2, W+2, C2) [pre-padded 1], k (3, 3, C2, C2),
    y out (1, band, W, C2) fp32, p out (1, 2, C2) fp32 accumulated across
    the band grid dimension (same block revisited; i==0 initializes)."""
    f32 = jnp.float32
    c2 = k_ref.shape[-1]
    w = y_ref.shape[2]
    t = band
    i = pl.program_id(1)

    acc = jnp.zeros((t * w, c2), f32)
    for dy in range(3):
        for dx in range(3):
            patch = z_ref[0, dy:dy + t, dx:dx + w, :].reshape(t * w, c2)
            acc = acc + jnp.dot(patch, k_ref[dy, dx],
                                preferred_element_type=f32)
    y_ref[0] = acc.astype(y_ref.dtype).reshape(t, w, c2)
    part = jnp.stack([jnp.sum(acc, axis=0), jnp.sum(acc * acc, axis=0)])

    @pl.when(i == 0)
    def _():
        p_ref[0] = part

    @pl.when(i > 0)
    def _():
        p_ref[0] = p_ref[0] + part


def _an_band_a(h: int, w: int, c: int, itemsize: int = 2,
               budget: int = 10 * 2 ** 20):
    c2 = 2 * c
    for t in (32, 16, 8, 4, 2):
        if h % t:
            continue
        est = (9 * c2 * c2 * itemsize            # k1 whole in VMEM
               + 2 * (t + 2) * (w + 2) * c * itemsize   # s, t blocks
               + (t + 2) * (w + 2) * c2 * itemsize      # x_scr
               + t * w * c2 * 4                         # fp32 accumulator
               + 3 * t * w * c2 * itemsize              # live tap patches
               + t * w * c2 * itemsize)                 # z out
        if est <= budget:
            return t
    return None


def _an_band_b(h: int, w: int, c2: int, itemsize: int = 2,
               budget: int = 10 * 2 ** 20):
    for t in (32, 16, 8, 4, 2):
        if h % t:
            continue
        est = (9 * c2 * c2 * itemsize
               + (t + 2) * (w + 2) * c2 * itemsize      # z block
               + t * w * c2 * 4                         # accumulator
               + 3 * t * w * c2 * itemsize              # live tap patches
               + t * w * c2 * 4)                        # y out (fp32)
        if est <= budget:
            return t
    return None


def alignnet_body0_supported(h: int, w: int, c: int,
                             itemsize: int = 2) -> bool:
    """The 3x3 weights are blocked whole into VMEM: 2C <= 512 (9*(2C)^2*2B
    <= 4.7 MB); deeper scales (2C=1024 at 32/64px) stay on XLA."""
    return (c >= 64 and 2 * c <= 512
            and _an_band_a(h, w, c, itemsize) is not None
            and _an_band_b(h, w, 2 * c, itemsize) is not None)


def _alignnet_coeffs(s32, t32, g1, b1, diff_f_and_g: bool, eps: float):
    """The 5 per-(b, c) affine coefficients + the shortcut tensor h.
    Derivation: with s̄=(s-μs)·rsqrt(vs+eps), t̄ likewise (the AlignNet entry
    IN), h = [s̄-t̄, t̄] (diff_f_and_g) and norm1 = IN_affine(γ1, β1); every
    step is per-channel affine in (s, t) given the joint moments, and
    E[s̄-t̄]=E[t̄]=0 exactly, so norm1(h) = [as·s+at·t+b1h, ct·t+b2h]."""
    c = s32.shape[-1]
    es = jnp.mean(s32, axis=(1, 2))
    et = jnp.mean(t32, axis=(1, 2))
    ess = jnp.mean(s32 * s32, axis=(1, 2))
    ett = jnp.mean(t32 * t32, axis=(1, 2))
    est = jnp.mean(s32 * t32, axis=(1, 2))
    vs = jnp.maximum(ess - es * es, 0.0)
    vt = jnp.maximum(ett - et * et, 0.0)
    inv_s = jax.lax.rsqrt(vs + eps)
    inv_t = jax.lax.rsqrt(vt + eps)
    ga, gb = g1[:c].astype(jnp.float32), g1[c:].astype(jnp.float32)
    ba, bb = b1[:c].astype(jnp.float32), b1[c:].astype(jnp.float32)
    if diff_f_and_g:
        # var(s̄-t̄) = E[s̄²] + E[t̄²] - 2E[s̄t̄] (zero-mean)
        cov = est - es * et
        vd = jnp.maximum(vs * inv_s * inv_s + vt * inv_t * inv_t
                         - 2.0 * cov * inv_s * inv_t, 0.0)
        rd = jax.lax.rsqrt(vd + eps)
        as_ = inv_s * rd * ga
        at_ = -inv_t * rd * ga
        b1h = (et * inv_t - es * inv_s) * rd * ga + ba
    else:
        r1 = jax.lax.rsqrt(vs * inv_s * inv_s + eps)
        as_ = inv_s * r1 * ga
        at_ = jnp.zeros_like(as_)
        b1h = -es * inv_s * r1 * ga + ba
    r2 = jax.lax.rsqrt(vt * inv_t * inv_t + eps)
    ct_ = inv_t * r2 * gb
    b2h = -et * inv_t * r2 * gb + bb
    coeffs = jnp.stack([as_, at_, b1h, ct_, b2h], axis=1)  # (B, 5, C)

    sn = (s32 - es[:, None, None, :]) * inv_s[:, None, None, :]
    tn = (t32 - et[:, None, None, :]) * inv_t[:, None, None, :]
    h1 = sn - tn if diff_f_and_g else sn
    return coeffs, h1, tn


def alignnet_body0_reference(s, t, g1, b1, k1, alpha, k2, g2, b2,
                             diff_f_and_g: bool = True, eps: float = 1e-5):
    """XLA oracle / custom_vjp backward: the exact module-path math
    (nn/samm.py AlignNet entry IN + _XavierBottleneckIR body0)."""

    def inorm(x, gamma=None, beta=None):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        mean2 = jnp.mean(x * x, axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        if gamma is not None:
            y = y * gamma.astype(y.dtype) + beta.astype(y.dtype)
        return y

    def conv(v, k):
        return lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    s32, t32 = s.astype(jnp.float32), t.astype(jnp.float32)
    sn, tn = inorm(s32), inorm(t32)
    h = jnp.concatenate([sn - tn, tn] if diff_f_and_g else [sn, tn], axis=-1)
    x1 = inorm(h, g1, b1)
    z = conv(x1, k1)
    z = jnp.where(z >= 0, z, alpha.reshape(1, 1, 1, -1).astype(z.dtype) * z)
    y2 = conv(z, k2)
    return (inorm(y2, g2, b2) + h).astype(s.dtype)


def _conv3x3_im2col(v, k):
    """3x3 pad-1 conv as one im2col dot_general: rows = B*H*W, K = 9*Ci,
    N = Co. Identical dot products to lax.conv (fp32 accumulation either
    way); only the op shape presented to the MXU changes."""
    b, h, w, ci = v.shape
    co = k.shape[-1]
    vp = jnp.pad(v, [(0, 0), (1, 1), (1, 1), (0, 0)])
    taps = [vp[:, i:i + h, j:j + w, :] for i in range(3) for j in range(3)]
    p = jnp.concatenate(taps, axis=-1).reshape(b, h * w, 9 * ci)
    km = k.astype(v.dtype).reshape(9 * ci, co)
    out = lax.dot_general(p, km, (((2,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    return out.reshape(b, h, w, co).astype(v.dtype)


def _conv3x3_batchfold(v, k):
    """3x3 pad-1 conv with the batch folded into height: pad each image
    with one zero row top+bottom, stack along H, run ONE batch-1 'same'
    conv (vertical pad contributes only to the sliced-away separator
    outputs), then slice each image's h rows back out. Every real output
    row sees exactly the neighbors + zero padding the per-image conv
    gives — bit-identical math, batch-1 conv schedule."""
    b, h, w, c = v.shape
    co = k.shape[-1]
    vz = jnp.pad(v, [(0, 0), (1, 1), (0, 0), (0, 0)])
    vv = vz.reshape(1, b * (h + 2), w, c)
    out = lax.conv_general_dilated(
        vv, k.astype(v.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(v.dtype)
    return out.reshape(b, h + 2, w, co)[:, 1:-1]


def _an_conv(v, k):
    if _CONV_MATMUL:
        return _conv3x3_im2col(v, k)
    bsz = v.shape[0]
    if ((_CONV_BATCHFOLD == "auto" and 2 <= bsz <= 4)
            or (_CONV_BATCHFOLD == "1" and bsz > 1)):
        return _conv3x3_batchfold(v, k)
    return lax.conv_general_dilated(
        v, k.astype(v.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(v.dtype)


def alignnet_t_context(t, g1, b1, k1, eps: float = 1e-5):
    """Cycle-invariant precomputation for algebraic_alignnet_body0.

    In SPM_Warp's align loop (SAMM/helpers.py:149-179) the encoder feature
    `t` is CONSTANT across the cycle_align iterations — only the warped
    generator feature `s` changes. Everything in the body0 algebra that
    depends on t alone is therefore loop-invariant: the t-moments, the
    normalized t̂ (= shortcut half h2), and — the expensive part — the
    t-half of conv1 (norm1's affine on t̂ convolved with k1[:, :, c:],
    half of conv1's MACs). XLA's CSE cannot hoist these as written in the
    joint formulation because the t-only coefficients are stacked with
    s-dependent ones into one tensor; this computes them t-only so
    SPMWarp can evaluate once before the loop. Exact same ops/order as
    the inline path -> bit-identical results at fp32; under the bf16
    island the stored tn/h halves are bf16 (r4 byte discipline), so the
    two paths agree to bf16 ULPs rather than bitwise."""
    c = t.shape[-1]
    cdt = jnp.bfloat16 if _CONV_BF16 else t.dtype
    k1 = k1.astype(cdt)   # cast-before-slice, see algebraic_alignnet_body0
    t32 = t.astype(jnp.float32)
    et = jnp.mean(t32, axis=(1, 2))
    ett = jnp.mean(t32 * t32, axis=(1, 2))
    vt = jnp.maximum(ett - et * et, 0.0)
    inv_t = jax.lax.rsqrt(vt + eps)
    gb, bb = g1[c:].astype(jnp.float32), b1[c:].astype(jnp.float32)
    r2 = jax.lax.rsqrt(vt * inv_t * inv_t + eps)
    ct_ = (inv_t * r2 * gb)[:, None, None, :]
    b2h = (-et * inv_t * r2 * gb + bb)[:, None, None, :]
    x1b = (ct_ * t32 + b2h).astype(cdt)
    zb = _an_conv(x1b, k1[:, :, c:])
    # store the normalized t̂ in the WORK dtype (t.dtype): under the bf16
    # island a fp32 tn is a lossless upcast of bf16-quantized data held in
    # HBM across the align cycles — double the bytes for zero information
    # (r4 HLO traffic audit). fp32 pipelines are unchanged (no-op cast).
    tn = ((t32 - et[:, None, None, :])
          * inv_t[:, None, None, :]).astype(t.dtype)
    return {"et": et, "vt": vt, "inv_t": inv_t, "tn": tn, "zb": zb}


def algebraic_alignnet_body0(s, t, g1, b1, k1, alpha, k2, g2, b2,
                             diff_f_and_g: bool = True, eps: float = 1e-5,
                             t_ctx=None):
    """The SAME moments-folding algebra as fused_alignnet_body0 but in pure
    XLA: no custom-call fusion barriers, no pad pre-copies, autodiff'able.
    vs the module path it skips the entry-IN materializations (the affine
    coefficients absorb them), the 2C concat (conv1 splits into two summed
    convs over the halves), and norm1's extra stats pass. The norm2 +
    shortcut epilogue recomputes h elementwise from (s, t) — XLA fuses it
    with the y2 moments pass. t_ctx (from alignnet_t_context) supplies the
    cycle-invariant t-side terms so multi-cycle SPM_Warp skips the t-half
    conv after cycle 1."""
    c = s.shape[-1]
    cdt = jnp.bfloat16 if _CONV_BF16 else s.dtype
    conv = _an_conv
    # cast weights to the conv dtype BEFORE slicing: the half-kernel slices
    # materialize (ConcatBitcast buffers, 37.7 MB fp32 each at the
    # 2C=1024 scales) — slicing the cast tensor halves those bytes under
    # the bf16 island (no-op for fp32 pipelines)
    k1 = k1.astype(cdt)
    k2 = k2.astype(cdt)
    if t_ctx is not None:
        s32, t32 = s.astype(jnp.float32), t.astype(jnp.float32)
        et, vt, inv_t = t_ctx["et"], t_ctx["vt"], t_ctx["inv_t"]
        es = jnp.mean(s32, axis=(1, 2))
        ess = jnp.mean(s32 * s32, axis=(1, 2))
        vs = jnp.maximum(ess - es * es, 0.0)
        inv_s = jax.lax.rsqrt(vs + eps)
        ga = g1[:c].astype(jnp.float32)
        ba = b1[:c].astype(jnp.float32)
        if diff_f_and_g:
            est = jnp.mean(s32 * t32, axis=(1, 2))
            cov = est - es * et
            vd = jnp.maximum(vs * inv_s * inv_s + vt * inv_t * inv_t
                             - 2.0 * cov * inv_s * inv_t, 0.0)
            rd = jax.lax.rsqrt(vd + eps)
            as_ = inv_s * rd * ga
            at_ = -inv_t * rd * ga
            b1h = (et * inv_t - es * inv_s) * rd * ga + ba
        else:
            r1 = jax.lax.rsqrt(vs * inv_s * inv_s + eps)
            as_ = inv_s * r1 * ga
            at_ = jnp.zeros_like(as_)
            b1h = -es * inv_s * r1 * ga + ba
        x1a = (as_[:, None, None, :] * s32 + at_[:, None, None, :] * t32
               + b1h[:, None, None, :]).astype(cdt)
        z = conv(x1a, k1[:, :, :c]) + t_ctx["zb"]
        # shortcut halves in the WORK dtype: the final output is cast to
        # s.dtype anyway, so fp32 h tensors are wasted HBM bytes under the
        # bf16 island (r4 traffic audit: the fp32 h concat + its layout
        # copy alone wrote ~0.5 GB/img)
        sn = ((s32 - es[:, None, None, :])
              * inv_s[:, None, None, :]).astype(s.dtype)
        h1 = sn - t_ctx["tn"] if diff_f_and_g else sn
        h2 = t_ctx["tn"]
    else:
        s32, t32 = s.astype(jnp.float32), t.astype(jnp.float32)
        coeffs, h1, h2 = _alignnet_coeffs(s32, t32, g1, b1, diff_f_and_g,
                                          eps)
        h1, h2 = h1.astype(s.dtype), h2.astype(s.dtype)
        as_, at_, b1h, ct_, b2h = [coeffs[:, i][:, None, None, :]
                                   for i in range(5)]
        x1a = (as_ * s32 + at_ * t32 + b1h).astype(cdt)
        x1b = (ct_ * t32 + b2h).astype(cdt)

        if _CONCAT1:
            # one 2C-in conv over the materialized concat instead of two
            # summed C-in convs: trades one extra HBM pass for a single
            # bigger MXU op (better b=1 utilization at the 256px scale's
            # C=128 halves)
            z = conv(jnp.concatenate([x1a, x1b], axis=-1), k1)
        else:
            z = conv(x1a, k1[:, :, :c]) + conv(x1b, k1[:, :, c:])
    z = jnp.where(z >= 0, z, alpha.reshape(1, 1, 1, -1).astype(z.dtype) * z)
    # y2 leaves the conv already quantized to the work dtype; materializing
    # a fp32 upcast of it (the pre-r4 code) adds zero information. The IN
    # statistics still accumulate in fp32 — the casts below fuse into the
    # reductions/epilogue instead of writing a fp32 copy of y2 to HBM.
    y2 = conv(z, k2)
    y2f = y2.astype(jnp.float32)
    mu2 = jnp.mean(y2f, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(y2f * y2f, axis=(1, 2), keepdims=True)
    v2 = jnp.maximum(m2 - mu2 * mu2, 0.0)
    kk = jax.lax.rsqrt(v2 + eps) * g2.astype(jnp.float32)
    bb = b2.astype(jnp.float32) - mu2 * kk
    h = jnp.concatenate([h1, h2], axis=-1)
    return ((y2f * kk + bb).astype(s.dtype) + h).astype(s.dtype)


def _alignnet_pallas(s, t, coeffs, k1, alpha, k2, band_a: int, band_b: int,
                     cast_bf16: bool, interpret: bool = False):
    bsz, h, w, c = s.shape
    c2 = 2 * c
    cdt = jnp.bfloat16 if cast_bf16 else s.dtype
    pad1 = lambda v: jnp.pad(v, [(0, 0), (1, 1), (1, 1), (0, 0)])
    sp = pad1(s.astype(cdt))
    tp = pad1(t.astype(cdt))
    elem = lambda sizes: tuple(pl.Element(sz) for sz in sizes)

    ta = band_a
    z = pl.pallas_call(
        functools.partial(_an_conv1_kernel, band=ta),
        grid=(bsz, h // ta),
        in_specs=[
            pl.BlockSpec(elem((1, ta + 2, w + 2, c)),
                         lambda b, i: (b, i * ta, 0, 0)),
            pl.BlockSpec(elem((1, ta + 2, w + 2, c)),
                         lambda b, i: (b, i * ta, 0, 0)),
            pl.BlockSpec((1, 5, c), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((3, 3, c2, c2), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, c2), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(elem((1, ta, w, c2)),
                               lambda b, i: (b, i * ta, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c2), cdt),
        scratch_shapes=[pltpu.VMEM((ta + 2, w + 2, c2), cdt)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * h * w * c2 * c2, transcendentals=0,
            bytes_accessed=(2 * s.size + bsz * h * w * c2) * 4),
        interpret=interpret,
    )(sp, tp, coeffs, k1.astype(cdt), alpha[None].astype(cdt))

    tb = band_b
    y2, part = pl.pallas_call(
        functools.partial(_an_conv2_kernel, band=tb),
        grid=(bsz, h // tb),
        in_specs=[
            pl.BlockSpec(elem((1, tb + 2, w + 2, c2)),
                         lambda b, i: (b, i * tb, 0, 0)),
            pl.BlockSpec((3, 3, c2, c2), lambda b, i: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(elem((1, tb, w, c2)),
                         lambda b, i: (b, i * tb, 0, 0)),
            pl.BlockSpec((1, 2, c2), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, c2), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 2, c2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * h * w * c2 * c2, transcendentals=0,
            bytes_accessed=(2 * bsz * h * w * c2) * 4),
        interpret=interpret,
    )(pad1(z), k2.astype(cdt))
    return y2, part


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_alignnet_body0(s, t, g1, b1, k1, alpha, k2, g2, b2,
                         diff_f_and_g: bool = True):
    """Fused SAMM AlignNet entry + body0 bottleneck (see the section note).

    s: (B, H, W, C) raw generator feature (pre-entry-IN); t: (B, H, W, C)
    raw encoder feature; g1/b1 (2C,) norm1 affine; k1 (3, 3, 2C, 2C);
    alpha (2C,) PReLU slopes; k2 (3, 3, 2C, 2C); g2/b2 (2C,) norm2 affine.
    Returns the bottleneck output norm2(conv2(prelu(conv1(norm1(h))))) + h
    in s.dtype. Gate calls on alignnet_body0_supported()."""
    eps = 1e-5
    bsz, hh, ww, c = s.shape
    s32, t32 = s.astype(jnp.float32), t.astype(jnp.float32)
    coeffs, h1, h2 = _alignnet_coeffs(s32, t32, g1, b1, diff_f_and_g, eps)
    band_a = _an_band_a(hh, ww, c, 2)
    band_b = _an_band_b(hh, ww, 2 * c, 2)
    if band_a is None or band_b is None:
        return alignnet_body0_reference(s, t, g1, b1, k1, alpha, k2, g2, b2,
                                        diff_f_and_g, eps)

    run = functools.partial(_alignnet_pallas, band_a=band_a, band_b=band_b)
    y2, part = jax.lax.platform_dependent(
        s, t, coeffs, k1, alpha, k2,
        # on CPU (flax init traces there; the test suite) interpret in the
        # input dtype; on TPU cast the tap dots to bf16 — the same precision
        # XLA's default fp32-conv lowering gives the unfused path
        cpu=functools.partial(run, cast_bf16=False, interpret=True),
        default=functools.partial(run, cast_bf16=True))

    n = hh * ww
    mu2 = part[:, 0] / n
    v2 = jnp.maximum(part[:, 1] / n - mu2 * mu2, 0.0)
    kk = (jax.lax.rsqrt(v2 + eps) * g2.astype(jnp.float32))[:, None, None, :]
    bb = (b2.astype(jnp.float32)[None, :] - mu2 * jax.lax.rsqrt(v2 + eps)
          * g2.astype(jnp.float32))[:, None, None, :]
    h = jnp.concatenate([h1, h2], axis=-1)
    return (y2 * kk + bb + h).astype(s.dtype)


def _fab_fwd(s, t, g1, b1, k1, alpha, k2, g2, b2, diff_f_and_g):
    out = fused_alignnet_body0(s, t, g1, b1, k1, alpha, k2, g2, b2,
                               diff_f_and_g)
    return out, (s, t, g1, b1, k1, alpha, k2, g2, b2)


def _fab_bwd(diff_f_and_g, res, g):
    _, vjp = jax.vjp(
        lambda *a: alignnet_body0_reference(*a, diff_f_and_g), *res)
    return vjp(g)


fused_alignnet_body0.defvjp(_fab_fwd, _fab_bwd)
