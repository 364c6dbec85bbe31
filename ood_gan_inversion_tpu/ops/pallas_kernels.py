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

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
