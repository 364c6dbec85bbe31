"""Gather-free bilinear warp as pure-XLA banded matmuls (bounded flow).

Same algebra as the Pallas MXU warp kernel (ops/pallas_warp.py — see its
docstring for the bounded-displacement argument; reference workload:
SAMM/helpers.py:170-177): every SAMM sample lies within +-p pixels of its
output position, so the 4-tap bilinear fetch factors into

  * a sparse-2 horizontal interpolation matrix per output pixel,
    contracted over the padded width (an MXU dot_general batched over
    (batch, output row)), applied to the KV=2p+1 candidate source rows of
    each output row's band;
  * a sparse-2 vertical selection over the KV band rows (an elementwise
    multiply-reduce that XLA fuses with the dot's epilogue);
  * the SPM alpha blend.

Unlike the Pallas kernel this builds the overlapping row-band tensor
(B, H, KV, Wp, C) in HBM — ~KV/(band reuse) times the feature — so it
trades bandwidth for completely bypassing XLA's element-rate-capped TPU
gather lowering (PERF.md round 2: the gather is batch-FLAT at ~4.3 ms/img
at the 256px scale, the root cause of the batch>1 throughput collapse).
As plain XLA it keeps global fusion intact (no custom-call barrier — the
mechanism behind five standalone-wins-pipeline-losses recorded in PERF.md)
and is differentiable as traced; a custom_vjp still routes the backward
through the reference gather formulation to keep the remat policy's
memory profile.

Gating: OGI_XLA_WARP=1 (nn/samm.py), mutually exclusive with OGI_MXU_WARP
(the Pallas kernel wins precedence when both are set).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from .grid_sample import grid_sample_bilinear
from .pallas_warp import max_disp_px, warp_blend_reference  # noqa: F401

# OGI_XLA_WARP_BF16=1: materialize the row bands and the horizontal
# interpolation matrix in bf16 (fp32 dot accumulation). Halves the HBM
# traffic of the two large intermediates (xband, g) — the cost that
# dominates this formulation — at bf16 rounding of the warped feature.
_BF16 = os.environ.get("OGI_XLA_WARP_BF16", "0") == "1"


def _xla_warp_blend_fwd(target, grid, alpha, p: int):
    b, h, w, c = target.shape
    kv = 2 * p + 1
    fdt = jnp.float32
    bdt = jnp.bfloat16 if _BF16 else target.dtype

    # zero padding reproduces padding_mode='zeros': under the max_disp_px
    # bound every tap lands inside the padded frame, and out-of-image taps
    # read the zero border
    xp = jnp.pad(target.astype(bdt), [(0, 0), (p, p), (p, p), (0, 0)])
    wp = w + 2 * p
    # overlapping row bands: xband[b, i, v] = padded row i + v (true rows
    # [i - p, i + p] of output row i)
    xband = jnp.stack([xp[:, v:v + h] for v in range(kv)], axis=2)

    gx = grid[..., 0].astype(fdt)
    gy = grid[..., 1].astype(fdt)
    fx = ((gx + 1.0) * w - 1.0) * 0.5
    fy = ((gy + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0p = jnp.clip(x0.astype(jnp.int32) + p, 0, wp - 2)
    iy = lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
    ky0 = jnp.clip(y0.astype(jnp.int32) - iy + p, 0, kv - 2)

    ju = lax.broadcasted_iota(jnp.int32, (1, 1, 1, wp), 3)
    hw = (jnp.where(ju == x0p[..., None], (1.0 - wx)[..., None], 0.0)
          + jnp.where(ju == x0p[..., None] + 1, wx[..., None], 0.0))
    jv = lax.broadcasted_iota(jnp.int32, (1, 1, 1, kv), 3)
    vw = (jnp.where(jv == ky0[..., None], (1.0 - wy)[..., None], 0.0)
          + jnp.where(jv == ky0[..., None] + 1, wy[..., None], 0.0))

    # (b,i)[j,u] x (b,i)[v,u,c] -> (b,i)[j,(v,c)]. The MXU accumulates in
    # fp32 either way; bf16 g halves the biggest intermediate's HBM bytes
    # at one rounding of the already-interpolated value.
    g = lax.dot_general(hw.astype(bdt), xband,
                        (((3,), (3,)), ((0, 1), (0, 1))),
                        preferred_element_type=bdt if _BF16 else fdt)
    warped = jnp.sum(vw[..., None] * g.astype(fdt),
                     axis=3).astype(target.dtype)

    al = alpha if alpha.ndim == 4 else alpha[..., None]
    al = al.astype(target.dtype)
    return warped * al + target * (1.0 - al)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def xla_warp_blend(target, grid, alpha, p: int):
    """Bilinear-warp target at `grid` (|sample - output| <= p px) and
    alpha-blend with itself; exact vs warp_blend_reference."""
    return _xla_warp_blend_fwd(target, grid, alpha, p)


def _fwd(target, grid, alpha, p):
    return xla_warp_blend(target, grid, alpha, p), (target, grid, alpha)


def _bwd(p, res, ct):
    target, grid, alpha = res
    _, vjp = jax.vjp(warp_blend_reference, target, grid, alpha)
    return vjp(ct)


xla_warp_blend.defvjp(_fwd, _bwd)
