"""Gather-free MXU grid-sample for the SAMM warp (bounded displacement).

XLA's gather lowering on TPU is element-rate-capped: the 4-tap bilinear
fetch at the 256px SAMM scale measures ~4.3 ms/img REGARDLESS of batch,
descriptor count (patch vs 4 taps) or dtype (tools/prof/prof_warp_modes.py)
— it is the single batch-flat component behind the batch>1 throughput
collapse (PERF.md round 2). This kernel avoids the gather hardware
entirely by exploiting that SAMM flows are bounded (|dx|,|dy| <= warp
scale, SAMM/helpers.py:100-107 tanh*scale then clip): every output pixel
samples inside a +-P pixel window, so

  * horizontal bilinear selection for one output row is a small matmul:
    a sparse-2 selection matrix (W x Wp) built in VMEM from iota compares,
    contracted on the MXU against the row window (Wp x KV*C) holding all
    KV=2P+1 candidate source rows;
  * vertical selection is then KV masked multiply-adds on (W, C) slices;
  * the SPM alpha blend (aligned = warp*a + target*(1-a),
    SAMM/helpers.py:170-177) rides along in the epilogue.

The host pre-pads the feature by P (reproducing zero padding_mode) and
lays it out as (B, Wp, Hp*C) so each row window is ONE static minor-dim
slice — no in-kernel transposes. Weights are cast to the feature dtype for
the dot (bf16 in the bf16 serving island) with fp32 accumulation;
gradients go through a custom_vjp that recomputes the XLA reference
formulation (consistent with the decode remat policy).
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import grid_sample_bilinear

# kernel formulation: 1 = per-output-row full-window dot (column-major
# prepped layout), 2/3 = x-tiled lower-FLOP variants (measured SLOWER
# standalone, PERF.md r5), 4 = natural-NHWC-layout per-source-row dots (no
# host-side transpose prep). Read at trace time.
_KERNEL_VERSION = int(os.environ.get("OGI_WARP_KERNEL", "1"))

BAND = 8  # output rows per grid step. Fixed at 8: the fp32 grid/alpha
# blocks are (band, w)-shaped and Pallas requires the sublane dim divisible
# by 8, so smaller bands do not lower; larger ones were never needed (the
# 256px scale fits scoped VMEM at band=8 for every batch probed — see
# tools/prof/probe_warp_vmem.py).


def _round_up(v, m):
    return (v + m - 1) // m * m


def max_disp_px(scale: float, size: int) -> int:
    """Largest |sample - output| pixel offset of floor(f)'s tap pair under
    grid = linspace(-1,1) + flow, |flow| <= scale: the linspace-vs-pixel
    drift contributes +-0.5 and the flow scale*size/2."""
    return math.ceil(scale * size / 2.0 + 0.5) + 1


def _warp_kernel(xr_ref, gx_ref, gy_ref, al_ref, o_ref, *,
                 w: int, c: int, p: int, band: int):
    kv = 2 * p + 1
    wp = xr_ref.shape[1]
    fdt = jnp.float32
    jj = lax.broadcasted_iota(jnp.int32, (w, wp), 1)

    for r in range(band):
        gx = gx_ref[0, r].astype(fdt)
        gy = gy_ref[0, r].astype(fdt)
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * w - 1.0) * 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = fx - x0
        wy = fy - y0
        # column index in the padded frame; clip is a no-op when the caller's
        # bound holds (P from max_disp_px)
        x0p = jnp.clip(x0.astype(jnp.int32) + p, 0, wp - 2)
        # window row of the y0 tap: the KV-row window for this output row
        # spans true rows [row_global - p, row_global + p]
        row_global = pl.program_id(1) * band + r
        ky0 = y0.astype(jnp.int32) - row_global + p

        cmat = (jnp.where(jj == x0p[:, None], (1.0 - wx)[:, None], 0.0)
                + jnp.where(jj == x0p[:, None] + 1, wx[:, None], 0.0))
        rows = xr_ref[0, :, r * c:(r + kv) * c]
        g = lax.dot_general(cmat.astype(rows.dtype), rows,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=fdt)

        out = jnp.zeros((w, c), fdt)
        for k in range(kv - 1):
            m = (jnp.where(ky0 == k, 1.0 - wy, 0.0)
                 + jnp.where(ky0 + 1 == k, wy, 0.0))
            out = out + m[:, None] * g[:, k * c:(k + 1) * c]
        # k = kv-1 can only be the y1 tap
        m = jnp.where(ky0 + 1 == kv - 1, wy, 0.0)
        out = out + m[:, None] * g[:, (kv - 1) * c:kv * c]

        tgt = xr_ref[0, p:p + w, (r + p) * c:(r + p + 1) * c].astype(fdt)
        al = al_ref[0, r].astype(fdt)[:, None]
        o_ref[0, r] = (out * al + tgt * (1.0 - al)).astype(o_ref.dtype)


def _warp_kernel_v2(xr_ref, gx_ref, gy_ref, al_ref, o_ref, *,
                    w: int, c: int, p: int, band: int, tile: int):
    """Lower-FLOP reformulation (r5). v1 computes, per output row, the
    horizontal interpolation of ALL kv=2p+1 candidate source rows — a
    (W, Wp) @ (Wp, KV*C) dot whose kv factor is ~25x overwork at the 256px
    scale, plus a (W, KV*C) fp32 intermediate (3.2 MB/row) that must round-
    trip VMEM before the VPU vertical pass. v2 removes both:

      * the VERTICAL weight is folded INTO the selection matrix: for each
        padded source row s, A_s[(r,x), j] = vmask(r,x,s) * cmat_r[x, j]
        and out[r,x] += A_s[(r,x)] @ X[s] — accumulation happens in the
        dot, no intermediate, no vertical pass;
      * all `band` output rows stack into the dot's m dim (they share every
        source row when band <= kv), so one dot per (source row, x-tile)
        covers the whole band;
      * the x axis is TILED at `tile` outputs so the contraction is the
        tile's +-p window (tile+2p+2 <= 128 = exactly one MXU k-pass)
        instead of the full padded width Wp.

    MXU passes per output row at 256px/p=12: v1 = 2m*3k*25n = 150,
    v2 = ceil(256/96) tiles * 32 source rows * 6m / 8 rows = 72."""
    kv = 2 * p + 1
    ns = band + 2 * p  # padded source rows covering the band
    fdt = jnp.float32
    tiles = [(t, min(tile, w - t)) for t in range(0, w, tile)]

    gx = gx_ref[0].astype(fdt)   # (band, w)
    gy = gy_ref[0].astype(fdt)
    fx = ((gx + 1.0) * w - 1.0) * 0.5
    fy = ((gy + 1.0) * w - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0p = jnp.clip(x0.astype(jnp.int32) + p, 0, w + 2 * p - 2)
    # padded-window source row of the y0 tap (padded index s maps to global
    # row band_start + s - p; row r's taps land in s in [r, r+2p])
    sy0 = y0.astype(jnp.int32) - pl.program_id(1) * band + p

    for t0, tw in tiles:
        jj = lax.broadcasted_iota(jnp.int32, (band, tw, 128), 2)
        x0l = (x0p[:, t0:t0 + tw] - t0)[:, :, None]
        wxl = wx[:, t0:t0 + tw][:, :, None]
        cm = (jnp.where(jj == x0l, 1.0 - wxl, 0.0)
              + jnp.where(jj == x0l + 1, wxl, 0.0))   # (band, tw, 128)
        syl = sy0[:, t0:t0 + tw]                      # (band, tw)
        wyl = wy[:, t0:t0 + tw]

        acc = jnp.zeros((band * tw, c), fdt)
        for s in range(ns):
            vm = (jnp.where(syl == s, 1.0 - wyl, 0.0)
                  + jnp.where(syl + 1 == s, wyl, 0.0))
            a = ((vm[:, :, None] * cm)
                 .reshape(band * tw, 128).astype(xr_ref.dtype))
            rows = xr_ref[0, t0:t0 + 128, s * c:(s + 1) * c]
            acc = acc + lax.dot_general(a, rows, (((1,), (0,)), ((), ())),
                                        preferred_element_type=fdt)

        for r in range(band):
            tgt = xr_ref[0, p + t0:p + t0 + tw,
                         (p + r) * c:(p + r + 1) * c].astype(fdt)
            al = al_ref[0, r, t0:t0 + tw].astype(fdt)[:, None]
            out = acc[r * tw:(r + 1) * tw] * al + tgt * (1.0 - al)
            o_ref[0, r, t0:t0 + tw] = out.astype(o_ref.dtype)


def _warp_kernel_v3(xr_ref, gx_ref, gy_ref, al_ref, o_ref, *,
                    w: int, c: int, p: int, band: int, tile: int):
    """x-tiled v1 (r5): keeps v1's one-dot-per-output-row structure and its
    cheap VPU vertical pass, but tiles the x axis so the horizontal
    selection contraction is the tile's +-p window (tile+2p+2 <= 128, one
    MXU k-pass) instead of the full padded width Wp — the same 2x MXU-pass
    reduction as the per-source-row v2 decomposition without its 4x dot
    count and per-dot VPU rebuild (v2 measured SLOWER than v1 standalone:
    PERF.md r5 warp table)."""
    kv = 2 * p + 1
    fdt = jnp.float32
    tiles = [(t, min(tile, w - t)) for t in range(0, w, tile)]

    for r in range(band):
        gx = gx_ref[0, r].astype(fdt)
        gy = gy_ref[0, r].astype(fdt)
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * w - 1.0) * 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = fx - x0
        wy = fy - y0
        x0p = jnp.clip(x0.astype(jnp.int32) + p, 0, w + 2 * p - 2)
        row_global = pl.program_id(1) * band + r
        ky0 = y0.astype(jnp.int32) - row_global + p

        for t0, tw in tiles:
            jj = lax.broadcasted_iota(jnp.int32, (tw, 128), 1)
            x0l = (x0p[t0:t0 + tw] - t0)[:, None]
            wxl = wx[t0:t0 + tw][:, None]
            cmat = (jnp.where(jj == x0l, 1.0 - wxl, 0.0)
                    + jnp.where(jj == x0l + 1, wxl, 0.0))
            rows = xr_ref[0, t0:t0 + 128, r * c:(r + kv) * c]
            g = lax.dot_general(cmat.astype(rows.dtype), rows,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=fdt)

            kyl = ky0[t0:t0 + tw]
            wyl = wy[t0:t0 + tw]
            out = jnp.zeros((tw, c), fdt)
            for k in range(kv - 1):
                m = (jnp.where(kyl == k, 1.0 - wyl, 0.0)
                     + jnp.where(kyl + 1 == k, wyl, 0.0))
                out = out + m[:, None] * g[:, k * c:(k + 1) * c]
            m = jnp.where(kyl + 1 == kv - 1, wyl, 0.0)
            out = out + m[:, None] * g[:, (kv - 1) * c:kv * c]

            tgt = xr_ref[0, p + t0:p + t0 + tw,
                         (r + p) * c:(r + p + 1) * c].astype(fdt)
            al = al_ref[0, r, t0:t0 + tw].astype(fdt)[:, None]
            o_ref[0, r, t0:t0 + tw] = (out * al + tgt * (1.0 - al)) \
                .astype(o_ref.dtype)


def _warp_kernel_v4(xn_ref, gx_ref, gy_ref, al_ref, o_ref, *,
                    w: int, c: int, p: int, band: int, tile: int):
    """NATURAL-LAYOUT per-source-row kernel (r5). Same folded-selection
    structure as v2 — for each padded source row s and x-tile,
    out += (vm_s * cmat) @ X[s] — but reading the feature in its native
    NHWC layout: the dot's B operand is X[s, t0:t0+128, :] with the column
    axis on sublanes, so the HOST-side pad+transpose+reshape that v1-v3
    require (a full-feature layout copy per call, plus XLA relayout copies
    to satisfy the custom call's column-major operand constraint) vanishes.
    Standalone the v1 dot shape is ~10% faster, but in-pipeline the prep
    transpose costs more than that (PERF.md r5 warp tables)."""
    fdt = jnp.float32
    tiles = [(t, min(tile, w - t)) for t in range(0, w, tile)]
    ns = band + 2 * p

    gx = gx_ref[0].astype(fdt)   # (band, w)
    gy = gy_ref[0].astype(fdt)
    fx = ((gx + 1.0) * w - 1.0) * 0.5
    fy = ((gy + 1.0) * w - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0p = jnp.clip(x0.astype(jnp.int32) + p, 0, w + 2 * p - 2)
    sy0 = y0.astype(jnp.int32) - pl.program_id(1) * band + p

    for t0, tw in tiles:
        jj = lax.broadcasted_iota(jnp.int32, (band, tw, 128), 2)
        x0l = (x0p[:, t0:t0 + tw] - t0)[:, :, None]
        wxl = wx[:, t0:t0 + tw][:, :, None]
        cm = (jnp.where(jj == x0l, 1.0 - wxl, 0.0)
              + jnp.where(jj == x0l + 1, wxl, 0.0))   # (band, tw, 128)
        syl = sy0[:, t0:t0 + tw]                      # (band, tw)
        wyl = wy[:, t0:t0 + tw]

        acc = jnp.zeros((band * tw, c), fdt)
        for s in range(ns):
            vm = (jnp.where(syl == s, 1.0 - wyl, 0.0)
                  + jnp.where(syl + 1 == s, wyl, 0.0))
            a = ((vm[:, :, None] * cm)
                 .reshape(band * tw, 128).astype(xn_ref.dtype))
            rows = xn_ref[0, s, t0:t0 + 128, :]
            acc = acc + lax.dot_general(a, rows, (((1,), (0,)), ((), ())),
                                        preferred_element_type=fdt)

        for r in range(band):
            tgt = xn_ref[0, p + r, p + t0:p + t0 + tw, :].astype(fdt)
            al = al_ref[0, r, t0:t0 + tw].astype(fdt)[:, None]
            out = acc[r * tw:(r + 1) * tw] * al + tgt * (1.0 - al)
            o_ref[0, r, t0:t0 + tw] = out.astype(o_ref.dtype)


def mxu_warp_supported(h: int, w: int, c: int, p: int,
                       itemsize: int = 4) -> bool:
    """Shape + scoped-VMEM feasibility. The VMEM rule is probed, not
    modeled (tools/prof/probe_warp_vmem.py): at band=8 the per-row slide
    window minor dim (band+2p)*c decides fit — (h=256,c=128,p=12) = 16 KB/
    row compiles at every batch, (h=128,c=256,p=7) = 22.5 KB/row blows the
    16 MB scoped-VMEM limit (19.03M) even standalone. bf16 features halve
    the row and re-enable the denser-channel scales."""
    return (h == w and h % BAND == 0 and c % 128 == 0
            and h + 2 * p <= 4096
            and (BAND + 2 * p) * c * itemsize <= 16384)


def warp_tile(w: int, p: int) -> int:
    """x-tile width for the v2 kernel: the largest multiple of 8 whose +-p
    selection window (tile + 2p + 2) fits one 128-lane MXU contraction,
    bounded so every tile's fixed 128-column window stays inside the padded
    width. 0 = v2 not applicable at this (w, p)."""
    t = (128 - 2 * p - 2) // 8 * 8
    if t <= 0 or w % 8 != 0:
        return 0
    wp = _round_up(w + 2 * p, 128)
    last_t0 = ((w - 1) // t) * t
    return t if last_t0 + 128 <= wp else 0


def _warp_blend_fwd(target, grid, alpha, p: int, interpret: bool = False,
                    version: int = None):
    b, h, w, c = target.shape
    kv = 2 * p + 1
    wp = _round_up(w + 2 * p, 128)
    hp = h + 2 * p

    tile = warp_tile(w, p)
    if version is None:
        version = _KERNEL_VERSION
    use_v2 = version == 2 and tile > 0

    gxn = grid[..., 0]
    gyn = grid[..., 1]
    aln = alpha[..., 0] if alpha.ndim == 4 else alpha
    if version == 4 and tile > 0:
        # natural-layout path: pad only — no transpose/reshape prep
        last_t0 = ((w - 1) // tile) * tile
        wp_r = max(w + 2 * p, last_t0 + 128)
        xn = jnp.pad(target,
                     [(0, 0), (p, p), (p, wp_r - w - p), (0, 0)])
        ns = BAND + 2 * p
        elem = lambda sizes: tuple(pl.Element(sz) for sz in sizes)
        return pl.pallas_call(
            functools.partial(_warp_kernel_v4, w=w, c=c, p=p, band=BAND,
                              tile=tile),
            grid=(b, h // BAND),
            in_specs=[
                pl.BlockSpec(elem((1, ns, wp_r, c)),
                             lambda bi, i: (bi, i * BAND, 0, 0)),
                pl.BlockSpec(elem((1, BAND, w)),
                             lambda bi, i: (bi, i * BAND, 0)),
                pl.BlockSpec(elem((1, BAND, w)),
                             lambda bi, i: (bi, i * BAND, 0)),
                pl.BlockSpec(elem((1, BAND, w)),
                             lambda bi, i: (bi, i * BAND, 0)),
            ],
            out_specs=pl.BlockSpec(elem((1, BAND, w, c)),
                                   lambda bi, i: (bi, i * BAND, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, w, c), target.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * h * w * ns * 128 * c // BAND,
                transcendentals=0,
                bytes_accessed=(2 * target.size + 3 * b * h * w)
                * target.dtype.itemsize),
            interpret=interpret,
        )(xn, gxn, gyn, aln)

    xp = jnp.pad(target, [(0, 0), (p, p), (p, p + (wp - w - 2 * p)), (0, 0)])
    xr = jnp.transpose(xp, (0, 2, 1, 3)).reshape(b, wp, hp * c)
    gx = grid[..., 0]
    gy = grid[..., 1]
    al = alpha[..., 0] if alpha.ndim == 4 else alpha

    comp_params = None
    if version == 3 and tile > 0:
        kern = functools.partial(_warp_kernel_v3, w=w, c=c, p=p, band=BAND,
                                 tile=tile)
        flops = 2 * b * h * w * 128 * kv * c
        # the x-tiled per-(row,tile) g intermediates push Mosaic's stack
        # past the default 16M scoped-VMEM limit (measured 29.2M at
        # 256px/c128); a per-kernel raise is NOT the global flag regression
        # of PERF.md r4 (that squeezed the whole pipeline's prefetch budget)
        comp_params = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
    elif use_v2:
        kern = functools.partial(_warp_kernel_v2, w=w, c=c, p=p, band=BAND,
                                 tile=tile)
        flops = 2 * b * h * w * (BAND + 2 * p) * 128 * c // BAND
    else:
        kern = functools.partial(_warp_kernel, w=w, c=c, p=p, band=BAND)
        flops = 2 * b * h * w * wp * kv * c

    elem = lambda sizes: tuple(pl.Element(sz) for sz in sizes)
    out = pl.pallas_call(
        kern,
        grid=(b, h // BAND),
        in_specs=[
            pl.BlockSpec(elem((1, wp, (BAND + 2 * p) * c)),
                         lambda bi, i: (bi, 0, i * BAND * c)),
            pl.BlockSpec(elem((1, BAND, w)),
                         lambda bi, i: (bi, i * BAND, 0)),
            pl.BlockSpec(elem((1, BAND, w)),
                         lambda bi, i: (bi, i * BAND, 0)),
            pl.BlockSpec(elem((1, BAND, w)),
                         lambda bi, i: (bi, i * BAND, 0)),
        ],
        out_specs=pl.BlockSpec(elem((1, BAND, w, c)),
                               lambda bi, i: (bi, i * BAND, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), target.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=(2 * target.size + 3 * b * h * w)
            * target.dtype.itemsize),
        interpret=interpret,
        **({"compiler_params": comp_params} if comp_params else {}),
    )(xr, gx, gy, al)
    return out


def warp_blend_reference(target, grid, alpha):
    """The exact XLA formulation this kernel replaces
    (nn/samm.py SPMWarp.__call__ warp + blend). Output keeps the target's
    dtype: with a bf16 feature and fp32 alpha the blend computes in fp32
    (like the kernel's fp32 accumulation) and casts back, so both
    platform_dependent branches agree on output type."""
    al = alpha if alpha.ndim == 4 else alpha[..., None]
    warped = grid_sample_bilinear(target, grid)
    return (warped * al + target * (1.0 - al)).astype(target.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mxu_warp_blend(target, grid, alpha, p: int):
    """Bilinear-warp target at `grid` and alpha-blend with itself, with the
    guarantee that every sample lies within +-p pixels of its output
    position (p from max_disp_px(scale, size)). Matches
    warp_blend_reference up to the dot's weight-dtype rounding."""
    return _warp_blend_fwd(target, grid, alpha, p)


def _fwd(target, grid, alpha, p):
    return mxu_warp_blend(target, grid, alpha, p), (target, grid, alpha)


def _bwd(p, res, ct):
    target, grid, alpha = res
    _, vjp = jax.vjp(warp_blend_reference, target, grid, alpha)
    return vjp(ct)


mxu_warp_blend.defvjp(_fwd, _bwd)


def warp_blend_platform(target, grid, alpha, p: int):
    """Platform-robust dispatch around the Mosaic kernel.

    The trace-time gate (nn/samm.py:use_mxu_warp) checks the session's
    default backend, but a single trace can be LOWERED for a different
    platform than the session default — param init runs under
    jax.default_device(cpu) on an axon session (CLAUDE.md policy), and the
    prof tools re-trace on whatever backend executes them. Selecting the
    branch per lowering platform means such traces take the XLA reference
    path instead of dying in Mosaic's cpu_lowering, while real TPU
    executions keep the kernel.
    """
    return lax.platform_dependent(
        target, grid, alpha,
        cpu=lambda t, g, a: warp_blend_reference(t, g, a),
        default=lambda t, g, a: mxu_warp_blend(t, g, a, p),
    )
