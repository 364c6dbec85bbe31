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

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

# A/B switch for the separable shift-add paths (see PERF.md): standalone they
# are memory-bound-optimal, but in the full 1024px pipeline XLA fuses the
# dilated-conv form with neighbouring elementwise work and wins by ~5%
# (31.0 vs 32.7 ms/img measured). Default off; OGI_UPFIRDN_FAST=1 enables.
_FAST = os.environ.get("OGI_UPFIRDN_FAST", "0") == "1"


def make_kernel(k) -> np.ndarray:
    """Build the normalized 2-D FIR kernel from a 1-D or 2-D spec.

    Mirrors `make_kernel` (reference src/ops/StyleGAN/model.py:19-27): a 1-D
    kernel becomes its outer product; the kernel is normalized to sum 1.
    Returns a NUMPY array: FIR kernels are compile-time constants, and the
    fast-path dispatch in upfirdn2d needs concrete values under tracing.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return k


def _separable_1d(kernel2d):
    """If the 2-D FIR kernel is an outer product k1 x k1 (all StyleGAN blur
    kernels are), return the 1-D factor; else None."""
    k = np.asarray(kernel2d)
    if k.ndim != 2 or k.shape[0] != k.shape[1]:
        return None
    # rank-1 check via SVD
    u, s, vt = np.linalg.svd(k)
    if s[1:].max(initial=0.0) > 1e-6 * s[0]:
        return None
    k1 = u[:, 0] * np.sqrt(s[0])
    if k1.sum() < 0:
        k1 = -k1
    # verify symmetry of factorization (k = outer(k1, k1))
    if not np.allclose(np.outer(k1, k1), k, atol=1e-6 * max(1.0, abs(k).max())):
        return None
    return k1.astype(np.float32)


def _fir_1d(x, k1, axis, pad0, pad1):
    """Correlate with flip(k1) (i.e. true convolution) along `axis` via
    shifted adds — XLA fuses the taps into ~2 memory passes, which beats its
    degenerate lowering of dilated depthwise convs by ~5x on TPU."""
    taps = len(k1)
    size = x.shape[axis]
    padw = [(0, 0)] * x.ndim
    padw[axis] = (pad0, pad1)
    xp = jnp.pad(x, padw)
    out = None
    out_len = size + pad0 + pad1 - taps + 1
    for a in range(taps):
        # true convolution: out[o] = sum_a k[a] * xp[o + (taps-1) - a]
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(taps - 1 - a, taps - 1 - a + out_len)
        t = float(k1[a]) * xp[tuple(idx)]
        out = t if out is None else out + t
    return out


def _up2_1d(x, k1, axis, pad0, pad1):
    """up=2 FIR along one axis via polyphase shifts + a free interleave
    reshape ((..., H, 2, ...) is exactly the row-major layout of 2H)."""
    taps = len(k1)
    assert taps == 4 and pad0 == 2 and pad1 == 1, (
        "fast path expects the standard 4-tap up2 padding")
    n = x.shape[axis]
    padw = [(0, 0)] * x.ndim
    padw[axis] = (1, 1)
    xp = jnp.pad(x, padw)

    def sl(start):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + n)
        return xp[tuple(idx)]

    prev, cur, nxt = sl(0), sl(1), sl(2)
    # From the zero-stuffed definition out[o] = sum_a k[a] * xz[o + 1 - a]
    # (pad0=2 folded in): even phase o=2i -> k[3] x[i-1] + k[1] x[i];
    # odd phase o=2i+1 -> k[2] x[i] + k[0] x[i+1].
    even = float(k1[3]) * prev + float(k1[1]) * cur
    odd = float(k1[2]) * cur + float(k1[0]) * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


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

    # Fast path (opt-in): separable shift-multiply-add instead of the dilated
    # depthwise conv. Standalone the conv form is ~60x off roofline (3.4 ms
    # for a 512->1024 x64ch upsample, 2.65 ms for a 4x4 blur of a 256^2x3
    # align map), BUT end-to-end XLA fuses the conv form with neighbouring
    # elementwise work and wins every A/B we ran — including a +3 ms
    # full-pipeline regression when small-channel blurs were forced onto the
    # shift-add path (PERF.md). Default stays the conv form.
    k1 = None
    if _FAST and not isinstance(kernel, jax.core.Tracer):
        k1 = _separable_1d(np.asarray(kernel))
    if k1 is not None and kh == kw:
        if up == 2 and down == 1 and (pad0, pad1) == (2, 1) and kh == 4:
            y = _up2_1d(x, k1, 1, pad0, pad1)
            return _up2_1d(y, k1, 2, pad0, pad1)
        if up == 1:
            y = _fir_1d(x, k1, 1, pad0, pad1)
            if down > 1:
                y = y[:, ::down]
            y = _fir_1d(y, k1, 2, pad0, pad1)
            if down > 1:
                y = y[:, :, ::down]
            return y

    # general fallback: one dilated depthwise conv.
    # torch F.conv2d(x, flip(k)) is cross-correlation with the flipped kernel,
    # which equals true convolution with k. lax conv is also cross-correlation,
    # so we pass the flipped kernel to match.
    k = jnp.flip(jnp.asarray(kernel), (0, 1)).astype(x.dtype)
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
