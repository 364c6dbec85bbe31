"""Bilinear grid sampling (the SAMM warp primitive).

Matches torch F.grid_sample defaults used by the reference SAMM warp
(src/ops/SAMM/helpers.py:170-175): mode='bilinear', padding_mode='zeros',
align_corners=False. Note the reference builds its grid with
linspace(-1, 1) + flow, which under align_corners=False is *not* an exact
identity at zero flow -- we reproduce that faithfully since trained SAMM
weights depend on it.

TPU formulation: the four neighbour fetches are expressed as one advanced-
index gather over the flattened spatial axis (XLA gather), with out-of-bounds
taps masked to zero. SAMM warps run at 32..256 px so gather bandwidth is
negligible next to the generator convs; a Pallas gather kernel is an option
if training profiles say otherwise.
"""

import jax
import jax.numpy as jnp


def grid_sample_bilinear(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample NHWC `x` at normalized locations `grid` (N, Hg, Wg, 2).

    grid[..., 0] is the x (width) coordinate, grid[..., 1] the y coordinate,
    both in [-1, 1] with align_corners=False pixel mapping
    pix = ((coord + 1) * size - 1) / 2 and zero padding outside.
    """
    n, h, w, c = x.shape
    gh, gw = grid.shape[1], grid.shape[2]

    fx = ((grid[..., 0] + 1.0) * w - 1.0) / 2.0   # (N, Hg, Wg)
    fy = ((grid[..., 1] + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        flat = yi_c * w + xi_c                                   # (N, Hg, Wg)
        src = x.reshape(n, h * w, c)
        vals = jnp.take_along_axis(src, flat.reshape(n, gh * gw, 1), axis=1)
        vals = vals.reshape(n, gh, gw, c)
        return vals * valid[..., None].astype(x.dtype)

    w00 = ((1 - wx) * (1 - wy))[..., None].astype(x.dtype)
    w01 = (wx * (1 - wy))[..., None].astype(x.dtype)
    w10 = ((1 - wx) * wy)[..., None].astype(x.dtype)
    w11 = (wx * wy)[..., None].astype(x.dtype)

    return (tap(y0, x0) * w00 + tap(y0, x1) * w01 +
            tap(y1, x0) * w10 + tap(y1, x1) * w11)
