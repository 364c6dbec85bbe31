"""upfirdn2d: upsample -> pad -> FIR filter -> downsample, as one XLA conv.

Replaces the reference CUDA kernel (src/ops/op/upfirdn2d_kernel.cu:52-137) and
matches the semantics of its pure-torch fallback (src/ops/op/upfirdn2d.py:
160-193): zero-insertion upsampling appends up-1 zeros AFTER each sample,
then pads, then correlates with the flipped kernel (i.e. true convolution),
then keeps every `down`-th output starting at 0.

TPU formulation: a single `lax.conv_general_dilated` with
  * lhs_dilation=(up, up)      -- zero insertion between samples
  * high-side padding + (up-1) -- recovers the reference's trailing zeros
  * window_strides=(down,down) -- the decimation
  * feature_group_count=C      -- depthwise (same FIR for every channel)
XLA fuses this with neighbouring elementwise work; no hand-written kernel or
host round-trip is needed. Layout is NHWC throughout.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np


def make_kernel(k) -> jnp.ndarray:
    """Build the normalized 2-D FIR kernel from a 1-D or 2-D spec.

    Mirrors `make_kernel` (reference src/ops/StyleGAN/model.py:19-27): a 1-D
    kernel becomes its outer product; the kernel is normalized to sum 1.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return jnp.asarray(k)


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jnp.ndarray:
    """Apply upfirdn to an NHWC tensor.

    Args:
      x: (N, H, W, C).
      kernel: (kh, kw) FIR filter (already scaled, e.g. by up**2 for upsample).
      up/down: integer resampling factors (same for both spatial dims).
      pad: (pad0, pad1) applied as (before, after) on BOTH spatial dims,
        exactly like the reference's `pad=(pad[0], pad[1], pad[0], pad[1])`.
        Negative values crop (XLA conv supports negative padding natively).
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = int(pad[0]), int(pad[1])
    # torch F.conv2d(x, flip(k)) is cross-correlation with the flipped kernel,
    # which equals true convolution with k. lax conv is also cross-correlation,
    # so we pass the flipped kernel to match.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    out = lax.conv_general_dilated(
        x, k,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def _resample_pads(k_len: int, factor: int, up: bool):
    p = k_len - factor
    if up:
        pad0 = (p + 1) // 2 + factor - 1
        pad1 = p // 2
    else:
        pad0 = (p + 1) // 2
        pad1 = p // 2
    return pad0, pad1


def upsample2x(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """FIR upsample (reference `Upsample`, model.py:30-48). `kernel` is the
    normalized 2-D kernel; gain factor**2 is applied here."""
    pad0, pad1 = _resample_pads(kernel.shape[0], factor, up=True)
    return upfirdn2d(x, kernel * (factor ** 2), up=factor, down=1, pad=(pad0, pad1))


def downsample2x(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """FIR downsample (reference `Downsample`, model.py:51-69)."""
    pad0, pad1 = _resample_pads(kernel.shape[0], factor, up=False)
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(x: jnp.ndarray, kernel: jnp.ndarray, pad, upsample_factor: int = 1) -> jnp.ndarray:
    """FIR blur (reference `Blur`, model.py:72-88)."""
    k = kernel * (upsample_factor ** 2) if upsample_factor > 1 else kernel
    return upfirdn2d(x, k, up=1, down=1, pad=pad)
