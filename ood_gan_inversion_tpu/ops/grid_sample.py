"""Bilinear grid sampling (the SAMM warp primitive).

Matches torch F.grid_sample defaults used by the reference SAMM warp
(src/ops/SAMM/helpers.py:170-175): mode='bilinear', padding_mode='zeros',
align_corners=False. Note the reference builds its grid with
linspace(-1, 1) + flow, which under align_corners=False is *not* an exact
identity at zero flow -- we reproduce that faithfully since trained SAMM
weights depend on it.

TPU formulations (OGI_GRIDSAMPLE selects; all exact, parity-tested):
  * "gather4" (default): four take_along_axis fetches over the flattened
    spatial axis. Measures 0.5 ms/img FASTER end-to-end than "patch" in the
    full pipeline (32.80 vs 33.33, PERF.md) despite issuing 4x the gathers.
  * "patch": ONE lax.gather fetching the 2x2xC bilinear support per output
    pixel from a zero-padded operand (PROMISE_IN_BOUNDS after clipping),
    then the 4-tap weighted sum.
"""

import os

import jax
import jax.numpy as jnp
from jax import lax

_MODE = os.environ.get("OGI_GRIDSAMPLE", "gather4")


def _coords(x, grid):
    n, h, w, c = x.shape
    fx = ((grid[..., 0].astype(jnp.float32) + 1.0) * w - 1.0) / 2.0
    fy = ((grid[..., 1].astype(jnp.float32) + 1.0) * h - 1.0) / 2.0
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0).astype(x.dtype)
    wy = (fy - y0).astype(x.dtype)
    return x0.astype(jnp.int32), y0.astype(jnp.int32), wx, wy


def _weights(wx, wy):
    return ((1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy)


def _grid_sample_gather4(x, grid):
    n, h, w, c = x.shape
    gh, gw = grid.shape[1], grid.shape[2]
    x0, y0, wx, wy = _coords(x, grid)
    x1, y1 = x0 + 1, y0 + 1

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        flat = yi_c * w + xi_c
        src = x.reshape(n, h * w, c)
        vals = jnp.take_along_axis(src, flat.reshape(n, gh * gw, 1), axis=1)
        vals = vals.reshape(n, gh, gw, c)
        return vals * valid[..., None].astype(x.dtype)

    w00, w01, w10, w11 = [v[..., None] for v in _weights(wx, wy)]
    return (tap(y0, x0) * w00 + tap(y0, x1) * w01 +
            tap(y1, x0) * w10 + tap(y1, x1) * w11)


def _grid_sample_gather4_flat(x, grid):
    """gather4 with the batch axis FOLDED INTO the gather row index: one
    2-D (N*H*W, C) operand and global row ids instead of
    operand_batching_dims — probes whether XLA's batched-gather lowering is
    what collapses at batch>1."""
    n, h, w, c = x.shape
    gh, gw = grid.shape[1], grid.shape[2]
    x0, y0, wx, wy = _coords(x, grid)
    x1, y1 = x0 + 1, y0 + 1
    src = x.reshape(n * h * w, c)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = (base + jnp.clip(yi, 0, h - 1) * w
                + jnp.clip(xi, 0, w - 1)).reshape(n * gh * gw)
        vals = jnp.take(src, flat, axis=0,
                        indices_are_sorted=False, unique_indices=False)
        vals = vals.reshape(n, gh, gw, c)
        return vals * valid[..., None].astype(x.dtype)

    w00, w01, w10, w11 = [v[..., None] for v in _weights(wx, wy)]
    return (tap(y0, x0) * w00 + tap(y0, x1) * w01 +
            tap(y1, x0) * w10 + tap(y1, x1) * w11)


def _grid_sample_gather4_packed(x, grid):
    """gather4 with CHANNEL-PAIR PACKING: XLA's TPU gather is element-rate-
    capped (~8 elem/cycle, PERF.md r2 — insensitive to operand dtype), so
    for 2-byte dtypes with even C the taps are fetched as c/2 uint32 lanes
    (pairs of channels bitcast together) — HALF the gathered elements, then
    bitcast back before the bilinear blend. Pure bit movement: results are
    exactly the plain gather4's."""
    n, h, w, c = x.shape
    gh, gw = grid.shape[1], grid.shape[2]
    x0, y0, wx, wy = _coords(x, grid)
    x1, y1 = x0 + 1, y0 + 1
    cp = c // 2
    src = lax.bitcast_convert_type(
        x.reshape(n, h * w, cp, 2), jnp.uint32)       # (n, h*w, cp)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
        vals = jnp.take_along_axis(src, flat.reshape(n, gh * gw, 1), axis=1)
        vals = lax.bitcast_convert_type(
            vals.reshape(n, gh, gw, cp), x.dtype).reshape(n, gh, gw, c)
        return vals * valid[..., None].astype(x.dtype)

    w00, w01, w10, w11 = [v[..., None] for v in _weights(wx, wy)]
    return (tap(y0, x0) * w00 + tap(y0, x1) * w01 +
            tap(y1, x0) * w10 + tap(y1, x1) * w11)


def _grid_sample_patch(x, grid):
    """One gather of the (2, 2, C) support per output pixel from a 1-padded
    operand; per-tap validity masks reproduce the zero padding for taps the
    clip distorts."""
    n, h, w, c = x.shape
    gh, gw = grid.shape[1], grid.shape[2]
    x0, y0, wx, wy = _coords(x, grid)

    xpad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    sy = jnp.clip(y0 + 1, 0, h)            # slice start in padded coords
    sx = jnp.clip(x0 + 1, 0, w)
    starts = jnp.stack([sy, sx], axis=-1).reshape(n, gh * gw, 2)

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patch = lax.gather(xpad, starts, dnums, slice_sizes=(1, 2, 2, c),
                       mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    patch = patch.reshape(n, gh, gw, 2, 2, c)

    w00, w01, w10, w11 = _weights(wx, wy)

    def valid(yi, xi):
        # strict in-image validity: any tap with a true index inside the
        # image implies the start clip did not bind, so its patch value is
        # correct; all other taps contribute zero
        return ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(x.dtype)

    x1, y1 = x0 + 1, y0 + 1
    out = (patch[:, :, :, 0, 0, :] * (w00 * valid(y0, x0))[..., None]
           + patch[:, :, :, 0, 1, :] * (w01 * valid(y0, x1))[..., None]
           + patch[:, :, :, 1, 0, :] * (w10 * valid(y1, x0))[..., None]
           + patch[:, :, :, 1, 1, :] * (w11 * valid(y1, x1))[..., None])
    return out


def grid_sample_bilinear(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample NHWC `x` at normalized locations `grid` (N, Hg, Wg, 2).

    grid[..., 0] is the x (width) coordinate, grid[..., 1] the y coordinate,
    both in [-1, 1] with align_corners=False pixel mapping
    pix = ((coord + 1) * size - 1) / 2 and zero padding outside.
    """
    if _MODE == "patch":
        return _grid_sample_patch(x, grid)
    if _MODE == "gather4flat":
        return _grid_sample_gather4_flat(x, grid)
    if _MODE == "gather4bf16":
        # halve the gather bytes: fetch taps in bf16, blend in x.dtype
        out = _grid_sample_gather4(x.astype(jnp.bfloat16), grid)
        return out.astype(x.dtype)
    if (_MODE == "gather4packed"
            and jnp.dtype(x.dtype).itemsize == 2 and x.shape[-1] % 2 == 0):
        # bit-identical channel-pair packing — halves the gathered elements
        # but LOST its end-to-end A/B at b=1 (23.74 vs 22.46 ms/img,
        # PERF.md r4: the bitcast/reshape chain around the gather costs
        # more fusion than the element count saves), so it is OPT-IN.
        return _grid_sample_gather4_packed(x, grid)
    return _grid_sample_gather4(x, grid)
