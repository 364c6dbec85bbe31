"""Modulated deformable convolution as gathers + tap-wise matmuls.

Replaces the reference CUDA DCN extension
(BasicSR/basicsr/ops/dcn/src/deform_conv_cuda*.{cpp,cu}, 1716 LoC) and the
torchvision-backed wrapper (src/ops/dcn.py:6-64) used by
bottleneck_IR_Deform (src/ops/e4e/encoders/helpers.py:400-421).

TPU formulation: for each of the k*k kernel taps, bilinearly sample the
input at (base grid + tap + learned offset), scale by the learned modulation
mask, then contract channels with that tap's weight slice — k*k gathers plus
k*k (HW x Cin x Cout) matmuls that run on the MXU. Offset convention matches
torchvision deform_conv2d: offset channels are (dy, dx) pairs ordered
tap-major ((ky*kw + kx)*2 + {0,1}).
"""

import jax
import jax.numpy as jnp


def _bilinear_sample_abs(x, py, px):
    """Sample NHWC `x` at absolute pixel coords py/px (N, Ho, Wo); zeros
    outside."""
    n, h, w, c = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        src = x.reshape(n, h * w, c)
        g = jnp.take_along_axis(src, flat.reshape(n, -1, 1), axis=1)
        g = g.reshape(flat.shape + (c,))
        return g * valid[..., None].astype(x.dtype)

    return (tap(y0, x0) * ((1 - wy) * (1 - wx))[..., None].astype(x.dtype) +
            tap(y0, x0 + 1) * ((1 - wy) * wx)[..., None].astype(x.dtype) +
            tap(y0 + 1, x0) * (wy * (1 - wx))[..., None].astype(x.dtype) +
            tap(y0 + 1, x0 + 1) * (wy * wx)[..., None].astype(x.dtype))


def deform_conv2d(x, offset, weight, mask=None, bias=None, stride=1,
                  padding=1):
    """x: (N,H,W,Cin); offset: (N,Ho,Wo,2*kh*kw) [(dy,dx) tap-major];
    weight: (kh,kw,Cin,Cout); mask: (N,Ho,Wo,kh*kw) or None."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1

    base_y = (jnp.arange(ho) * stride - padding).astype(x.dtype)
    base_x = (jnp.arange(wo) * stride - padding).astype(x.dtype)
    gy = jnp.broadcast_to(base_y[:, None], (ho, wo))
    gx = jnp.broadcast_to(base_x[None, :], (ho, wo))

    out = jnp.zeros((n, ho, wo, cout), x.dtype)
    for ky in range(kh):
        for kx in range(kw):
            t = ky * kw + kx
            dy = offset[..., 2 * t]
            dx = offset[..., 2 * t + 1]
            py = gy[None] + ky + dy
            px = gx[None] + kx + dx
            sampled = _bilinear_sample_abs(x, py, px)     # (N,Ho,Wo,Cin)
            if mask is not None:
                sampled = sampled * mask[..., t:t + 1].astype(x.dtype)
            out = out + jnp.einsum("nhwc,co->nhwo", sampled,
                                   weight[ky, kx].astype(x.dtype))
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
