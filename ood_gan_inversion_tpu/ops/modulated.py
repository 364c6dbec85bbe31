"""Style-modulated convolution via the scaled-input/scaled-output rewrite.

The reference (src/ops/StyleGAN/model.py:233-274) builds a per-sample weight
  w_eff[b,o,i,·] = scale * W[o,i,·] * s[b,i]          (modulation)
  w_eff *= rsqrt(sum_{i,k} w_eff^2 + 1e-8)            (demodulation, per b,o)
and runs a grouped conv with groups=batch. Grouped-by-batch convs do not map
onto the TPU MXU. Because convolution is linear, the identical result is

  y[b] = conv(x[b] * s[b], scale * W) * d[b]
  d[b,o] = rsqrt( (s[b]^2 . sumk(scale*W)^2)[o] + 1e-8 )

i.e. one big batched conv (MXU-friendly, all samples share one weight) plus
two cheap per-channel scalings that XLA fuses into the conv epilogue. The
demodulation factor is computed exactly (same value as the reference) from
the k-summed squared weight, so numerics agree to float rounding.

Upsample path: the reference runs conv_transpose2d(stride=2) then FIR-blur;
here that is conv_general_dilated with lhs_dilation=2 on the spatially
flipped kernel. The per-(b,o) demod scale commutes with the per-channel blur,
so it is applied after the blur.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .upfirdn2d import blur as fir_blur


def pixel_norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """Reference `PixelNorm` (model.py:11-16); channel axis is last here."""
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def equal_linear(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None,
                 lr_mul: float = 1.0) -> jnp.ndarray:
    """y = x @ (weight * scale) + bias * lr_mul.

    `weight` is stored (in, out) with init N(0,1)/lr_mul, matching the
    runtime math of reference `EqualLinear` (model.py:129-158);
    scale = lr_mul / sqrt(in).
    """
    in_dim = weight.shape[0]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    y = x @ (weight * scale)
    if bias is not None:
        y = y + bias * lr_mul
    return y


def equal_conv2d(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None,
                 stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """He-scaled conv, NHWC/HWIO. Reference `EqualConv2d` (model.py:91-120):
    scale = 1/sqrt(cin * k^2), weight init N(0,1)."""
    kh, kw, cin, cout = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    y = lax.conv_general_dilated(
        x, weight * scale,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.reshape(1, 1, 1, -1)
    return y


def demod_scale(weight_scaled: jnp.ndarray, style_scale: jnp.ndarray) -> jnp.ndarray:
    """d[b,o] = rsqrt( sum_i s[b,i]^2 * sum_k w[k,i,o]^2 + 1e-8 ), computed in
    fp32 regardless of the compute dtype (the 1e-8 eps and the squared sums
    underflow in bf16). weight_scaled: (kh, kw, Cin, Cout) with the he scale
    already applied; style_scale: (N, Cin). Returns (N, Cout) fp32."""
    w32 = weight_scaled.astype(jnp.float32)
    s32 = style_scale.astype(jnp.float32)
    w2 = jnp.sum(jnp.square(w32), axis=(0, 1))          # (Cin, Cout)
    return lax.rsqrt(jnp.square(s32) @ w2 + 1e-8)


def modulated_conv2d(x: jnp.ndarray, weight: jnp.ndarray, style_scale: jnp.ndarray,
                     demodulate: bool = True, upsample: bool = False,
                     downsample: bool = False,
                     blur_kernel: jnp.ndarray | None = None) -> jnp.ndarray:
    """Modulated (optionally demodulated) conv.

    Args:
      x: (N, H, W, Cin).
      weight: (kh, kw, Cin, Cout), init N(0,1); he-scale applied here.
      style_scale: (N, Cin) modulation scales (the EqualLinear output).
      blur_kernel: normalized 2-D FIR kernel, required when up/down sampling.
    """
    kh, kw, cin, cout = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)

    if demodulate:
        d = demod_scale(weight * scale, style_scale).astype(x.dtype)
    else:
        d = None

    w = (weight * scale).astype(x.dtype)
    s = style_scale.astype(x.dtype)

    xm = x * s[:, None, None, :]

    if upsample:
        factor = 2
        # torch conv_transpose2d(stride=2, padding=0) == lax conv with
        # lhs_dilation=2, padding=k-1 on both sides, spatially-flipped kernel.
        # The reference swaps in/out on the per-sample weight; with a shared
        # HWIO kernel the contraction axis (Cin) is unchanged.
        y = lax.conv_general_dilated(
            xm, jnp.flip(w, (0, 1)),
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(factor, factor),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # Blur pads from reference ModulatedConv2d.__init__ (model.py:199-205).
        p = (blur_kernel.shape[0] - factor) - (kh - 1)
        pad0 = (p + 1) // 2 + factor - 1
        pad1 = p // 2 + 1
        y = fir_blur(y, blur_kernel, pad=(pad0, pad1), upsample_factor=factor)
    elif downsample:
        factor = 2
        p = (blur_kernel.shape[0] - factor) + (kh - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        xm = fir_blur(xm, blur_kernel, pad=(pad0, pad1))
        y = lax.conv_general_dilated(
            xm, w, window_strides=(factor, factor), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        pad = kh // 2
        y = lax.conv_general_dilated(
            xm, w, window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    if d is not None:
        y = y * d[:, None, None, :]
    return y
