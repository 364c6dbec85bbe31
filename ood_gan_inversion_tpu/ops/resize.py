"""Deterministic image resizing as two small matrix multiplies.

The reference leans on torch F.interpolate in several distinct flavours:
  * bilinear, align_corners=False  -- encoder input 1024->256
    (src/archs/OOD_faceGAN_e4e_arch.py:258) and mask upsampling to 1024
    (same file, L330-332)
  * bicubic,  align_corners=True   -- FPN `_upsample_add`
    (src/ops/e4e/encoders/helpers.py:504-522) and `new_PRM`
    (src/ops/SAMM/helpers.py:62-77)
  * AdaptiveAvgPool2d              -- the ID loss 112x112 pool
    (src/losses/id_loss.py:31)

On TPU, separable resampling with *static* sizes is best expressed as
  y = M_h @ x @ M_w^T
with precomputed (out, in) interpolation matrices: two dense matmuls that run
on the MXU and fuse cleanly, instead of gathers. The matrices are built once
per (in, out, mode) in numpy and cached.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (torch's bicubic, A=-0.75)."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, (((t - 5.0) * t + 8.0) * t - 4.0) * a, 0.0),
    )
    return w


@lru_cache(maxsize=None)
def interp_matrix(in_size: int, out_size: int, method: str = "bilinear",
                  align_corners: bool = False):
    """(out_size, in_size) row-stochastic resampling matrix, float32 numpy.

    Methods: 'bilinear' (torch half-pixel, negative coord clamped to 0),
    'bicubic' (torch, 4-tap Keys kernel, border-clamped taps),
    'adaptive_avg' (torch AdaptiveAvgPool1d bin averaging).
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "adaptive_avg":
        for o in range(out_size):
            lo = (o * in_size) // out_size
            hi = -((-(o + 1) * in_size) // out_size)  # ceil
            m[o, lo:hi] = 1.0 / (hi - lo)
        return m.astype(np.float32)

    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = np.arange(out_size) * scale
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
        if method == "bilinear":
            src = np.maximum(src, 0.0)  # torch clamps only the linear path

    if method == "bilinear":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        i0c = np.clip(i0, 0, in_size - 1)
        i1c = np.clip(i0 + 1, 0, in_size - 1)
        for o in range(out_size):
            m[o, i0c[o]] += 1.0 - frac[o]
            m[o, i1c[o]] += frac[o]
    elif method == "bicubic":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for tap in range(-1, 3):
            w = _cubic_weight(tap - frac)
            idx = np.clip(i0 + tap, 0, in_size - 1)
            for o in range(out_size):
                m[o, idx[o]] += w[o]
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return m.astype(np.float32)


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """x: (N, H, W, C) -> (N, out_h, out_w, C) via two matmuls."""
    dt = x.dtype
    mh_j = jnp.asarray(mh, dtype=dt)
    mw_j = jnp.asarray(mw, dtype=dt)
    y = jnp.einsum("oh,nhwc->nowc", mh_j, x)
    y = jnp.einsum("pw,nowc->nopc", mw_j, y)
    return y


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) on NHWC."""
    oh, ow = size
    n, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, interp_matrix(h, oh, "bilinear", False),
                            interp_matrix(w, ow, "bilinear", False))


def resize_bicubic_ac(x: jnp.ndarray, size) -> jnp.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=True) on NHWC."""
    oh, ow = size
    n, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, interp_matrix(h, oh, "bicubic", True),
                            interp_matrix(w, ow, "bicubic", True))


def adaptive_avg_pool(x: jnp.ndarray, size) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d on NHWC."""
    oh, ow = size
    n, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, interp_matrix(h, oh, "adaptive_avg"),
                            interp_matrix(w, ow, "adaptive_avg"))
