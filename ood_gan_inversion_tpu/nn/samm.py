"""SAMM — Spatial Alignment and Masking Module (flax, NHWC).

Reference: src/ops/SAMM/helpers.py:22-215. Dataflow (faithfully reproduced):
given the encoder feature `feat` and the generator's conv output `gen_feat`
at one resolution, AlignNet predicts (dx, dy, alpha) from
(InstanceNorm(gen_warped) - InstanceNorm(feat), InstanceNorm(feat)); the flow
warps the *generator* feature (grid_sample, align_corners=False), alpha
soft-blends warped vs. original, iterated `cycle_align` times with flow
accumulation (clipped to +-scale) and alpha composition via new_PRM; on the
last cycle the coarser scale's alignment is merged (flow replaced, alpha
composed through a bicubic upsample).

Weight init matches the reference net effect: SPM_Warp xavier-normals every
conv weight it contains (SAMM/helpers.py:124-127 runs after, and overrides,
the zero-init at L117).

All state (the aligns pyramid) is explicit input/output — no module-held
dicts — so the whole arch forward is one pure jitted program.
"""

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .layers import (Conv2dTorch, InstanceNorm2d, FusedLeakyReLU,
                     xavier_normal_init)
from .irse import BottleneckIR
from .stylegan2 import ModulatedConv2d, StyledConv, NoiseInjection
from ..ops.upfirdn2d import make_kernel, blur as fir_blur
from ..ops.grid_sample import grid_sample_bilinear
from ..ops.pallas_kernels import (conv3x3_act, conv3x3_act_supported,
                                  fused_alignnet_body0,
                                  algebraic_alignnet_body0,
                                  alignnet_body0_supported,
                                  alignnet_t_context)
from ..ops.matmul_warp import xla_warp_blend
from ..ops.pallas_warp import (warp_blend_platform, mxu_warp_supported,
                               max_disp_px)
from ..ops.resize import resize_bicubic_ac


def new_prm(x, y):
    """Soft mask update y*g + x*(1-g), g=x, with bicubic-AC upsample of x to
    y's size when they differ (SAMM/helpers.py:62-77)."""
    if x.shape[1:3] != y.shape[1:3]:
        x = resize_bicubic_ac(x, (y.shape[1], y.shape[2]))
    return (y * x) + (x * (1.0 - x))


class _XavierConv(nn.Module):
    """Conv2d with xavier_normal weights (SPM_Warp.weight_init). setup-style
    (explicit in_ch) so the fused SAMM conv path can read `.weight` without
    invoking the module."""
    in_ch: int
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    def setup(self):
        self.weight = self.param(
            "weight", xavier_normal_init,
            (self.kernel_size, self.kernel_size, self.in_ch, self.out_ch))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.out_ch,))

    def __call__(self, x):
        y = jax.lax.conv_general_dilated(
            x, self.weight.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.bias.astype(y.dtype).reshape(1, 1, 1, -1)
        return y


# Fused Pallas conv+PReLU for the AlignNet hot convs. Standalone it beats
# the isolated XLA conv, but END-TO-END the custom-call boundary breaks
# XLA's fusion of the IN/conv/PReLU chain and costs ~3.5 ms/img
# (33.8 vs 30.2, PERF.md A/B) — default OFF; OGI_PALLAS_SAMM=1 enables.
_PALLAS_SAMM = os.environ.get("OGI_PALLAS_SAMM", "0") == "1"
# Whole-bottleneck fused kernel (round 2): entry-IN + concat + norm1 +
# conv1 + PReLU + conv2 + norm2-stats in two Pallas calls + two XLA passes
# (ops/pallas_kernels.py fused_alignnet_body0) — the larger fused region
# PERF.md's round-1 analysis called for. Parity-tested; end-to-end A/B
# LOST (29.1 vs 25.6 ms/img — the pad pre-copies and 16 custom-call
# fusion barriers per image outweigh the VMEM-residency win, the same
# reversal as every per-op SAMM kernel). Default OFF; OGI_SAMM_FUSED=1.
_SAMM_FUSED = os.environ.get("OGI_SAMM_FUSED", "0") == "1"
# The same moments-folding algebra in PURE XLA (no custom-call barriers):
# skips the entry-IN materializations, the 2C concat, and norm1's stats
# pass. OGI_SAMM_ALGEBRAIC=0 falls back to the literal module dataflow.
_SAMM_ALGEBRAIC = os.environ.get("OGI_SAMM_ALGEBRAIC", "1") == "1"
# Cross-cycle hoist of the encoder-side half of body0 (exact math, r4):
# SPMWarp computes the cycle-invariant target terms once before the align
# loop. OGI_SAMM_TCTX=0 disables (A/B knob).
_SAMM_TCTX = os.environ.get("OGI_SAMM_TCTX", "1") == "1"

# Gather-free MXU warp (ops/pallas_warp.py) for SAMM scales >= MIN px —
# XLA's gather is batch-flat at ~4.3 ms/img per 256px warp (PERF.md r2).
# End-to-end A/B on the real chip (prof_mxu_warp_ab.py, PERF.md r3):
# LOSES at b=1 (custom-call fusion barrier, 32.7 vs 26.6 ms/img), WINS at
# b=2 (37.3 vs 39.4), b=4 (2 of 3 runs: 36.6/39.6 vs 43.8/44.0) and b=8
# (21.6 vs 26.0). "auto" (default) therefore enables it on the TPU backend
# only when the traced batch >= OGI_MXU_WARP_BATCH; "1"/"0" force on/off.
# NOTE train-path gradient gap (ADVICE r2): under "auto" the forward runs
# the MXU kernel while its custom_vjp backward recomputes the XLA reference
# formulation, so training gradients are for a numerically-close but not
# bit-identical function; the CPU golden train-step parity can't see this
# because the backend gate turns the kernel off on CPU. MEASURED on the
# real chip (r4, prof_warp_grad_check.py, PERF.md "MXU-warp train-gradient
# spot check"): one full 1024px mod-256 train step with the kernel forced
# on vs off agrees to 1.1e-4 rel on l_total (worst loss 3e-3) and ~1e-5
# on the Adam update norms — benign. Also covered by
# tests/test_pallas_warp.py gradient checks (fwd/bwd consistency).
# The dispatch itself is wrapped in lax.platform_dependent
# (ops/pallas_warp.py:warp_blend_platform): the gate below is a trace-time
# HINT, and a trace lowered for a different platform than the session
# default (CPU param init under jax.default_device(cpu), prof tools) falls
# back to the XLA reference instead of dying in Mosaic's cpu_lowering.
_MXU_WARP = os.environ.get("OGI_MXU_WARP", "auto")
_MXU_WARP_BATCH = int(os.environ.get("OGI_MXU_WARP_BATCH", "2"))
_MXU_WARP_MIN = int(os.environ.get("OGI_MXU_WARP_MIN", "128"))
# bf16-cast policy for the MXU warp feature: "0" never; "1" only where
# the fp32 row window exceeds scoped VMEM (128px/c=256) and bf16 fits;
# "all" casts every MXU warp (also the VMEM-fitting 256px scale) for
# bandwidth/MXU-rate. NOTE on gradients: in the cast path the custom_vjp
# residual is the bf16-cast feature, so the backward recomputes the
# reference formulation AT BF16 INPUTS and the cotangent is
# bf16-quantized — slightly lower gradient precision than the uncast
# path (ADVICE r3). Default "1" is a deliberate default-numerics change
# (~0.3% rel on the warped feature, parity-tested); OGI_MXU_WARP_BF16=0
# restores strict fp32. A/B: PERF.md r4 "OGI_MXU_WARP_BF16" table.
_MXU_WARP_CAST_BF16 = os.environ.get("OGI_MXU_WARP_BF16", "1")
# Pure-XLA banded-matmul warp (ops/matmul_warp.py): same gather bypass with
# no custom-call barrier, at the price of materializing the row bands in
# HBM. Loses precedence to OGI_MXU_WARP when both are set.
_XLA_WARP = os.environ.get("OGI_XLA_WARP", "0") == "1"


def use_mxu_warp(batch: int) -> bool:
    """Batch-gated MXU-warp policy ("auto": on for TPU backends from
    OGI_MXU_WARP_BATCH per the A/B table above; True/"1" force, else off).
    """
    flag = _MXU_WARP
    if flag is True or flag == "1":
        return True
    # explicit TPU-platform check (ADVICE r2): the kernel is Mosaic-TPU-only;
    # "!= cpu" would have selected it on a hypothetical gpu backend too
    return (flag == "auto" and batch >= _MXU_WARP_BATCH
            and jax.default_backend() in ("tpu", "axon"))


class _XavierBottleneckIR(nn.Module):
    """bottleneck_IR with InstanceNorm norms and xavier conv weights — the
    AlignNet body unit (scaleNshiftBlock, SAMM/helpers.py:58-60)."""
    in_ch: int
    depth: int

    def setup(self):
        if self.in_ch != self.depth:
            self.shortcut_conv = _XavierConv(self.in_ch, self.depth, 1, 1, 0,
                                             use_bias=False)
            self.shortcut_norm = InstanceNorm2d(self.depth, affine=True)
        self.norm1 = InstanceNorm2d(self.in_ch, affine=True)
        self.conv1 = _XavierConv(self.in_ch, self.depth, 3, 1, 1,
                                 use_bias=False)
        self.prelu = self.param("prelu", nn.initializers.constant(0.25),
                                (self.depth,))
        self.conv2 = _XavierConv(self.depth, self.depth, 3, 1, 1,
                                 use_bias=False)
        self.norm2 = InstanceNorm2d(self.depth, affine=True)

    def __call__(self, x):
        if self.in_ch == self.depth:
            shortcut = x
        else:
            shortcut = self.shortcut_norm(self.shortcut_conv(x))
        res = self.norm1(x)
        b, h, w, _ = res.shape
        # bf16 matmul inputs on TPU = XLA's DEFAULT conv precision for fp32
        cdt = (jnp.bfloat16
               if res.dtype == jnp.float32 and jax.default_backend() != "cpu"
               else res.dtype)
        if _PALLAS_SAMM and conv3x3_act_supported(
                h, w, self.in_ch, self.depth, jnp.dtype(cdt).itemsize):
            res = conv3x3_act(res.astype(cdt), self.conv1.weight.astype(cdt),
                              self.prelu, "prelu")
            res = conv3x3_act(res, self.conv2.weight.astype(cdt),
                              jnp.zeros_like(self.prelu),
                              "none").astype(x.dtype)
        else:
            res = self.conv1(res)
            res = jnp.where(res >= 0, res,
                            self.prelu.reshape(1, 1, 1, -1).astype(res.dtype)
                            * res)
            res = self.conv2(res)
        res = self.norm2(res)
        return res + shortcut

    def fused_entry(self, source, target, diff_f_and_g: bool,
                    use_pallas: bool, t_ctx=None):
        """AlignNet entry-IN + concat + this bottleneck as one fused op
        (identity-shortcut case only: in_ch == depth = 2C). source/target
        are the RAW C-channel features, pre-entry-IN. use_pallas selects
        the Pallas kernels vs the pure-XLA algebraic formulation. t_ctx:
        precomputed cycle-invariant target-side terms (algebraic path
        only; see alignnet_t_context)."""
        assert self.in_ch == self.depth, "fused path needs identity shortcut"
        if use_pallas:
            return fused_alignnet_body0(
                source, target, self.norm1.scale, self.norm1.bias,
                self.conv1.weight, self.prelu, self.conv2.weight,
                self.norm2.scale, self.norm2.bias, diff_f_and_g)
        return algebraic_alignnet_body0(
            source, target, self.norm1.scale, self.norm1.bias,
            self.conv1.weight, self.prelu, self.conv2.weight,
            self.norm2.scale, self.norm2.bias, diff_f_and_g, t_ctx=t_ctx)

    def t_context(self, target):
        """Cycle-invariant target-side precomputation for the algebraic
        fused path (ops/pallas_kernels.py:alignnet_t_context)."""
        return alignnet_t_context(target, self.norm1.scale, self.norm1.bias,
                                  self.conv1.weight)


class AlignNet(nn.Module):
    """(dx, dy, alpha) predictor (SAMM/helpers.py:85-109)."""
    in_ch: int
    scale: float = 1.0
    diff_f_and_g: bool = True

    def setup(self):
        # setup-style (not compact) so SPMWarp can call t_context() outside
        # the per-cycle __call__ (cross-cycle hoisting of the target-side
        # conv1 half; the per-cycle calls then reuse it)
        self.body0 = _XavierBottleneckIR(self.in_ch * 2, self.in_ch * 2)
        self.body1 = _XavierBottleneckIR(self.in_ch * 2, 3)
        self.norm = InstanceNorm2d(self.in_ch, affine=False)

    def algebraic_selected(self, h: int, w: int) -> bool:
        """True when __call__ will take the pure-XLA algebraic body0 path
        (the one t_context can accelerate) for an (h, w) feature."""
        return (_SAMM_ALGEBRAIC
                and not (_SAMM_FUSED
                         and alignnet_body0_supported(h, w, self.in_ch)))

    def t_context(self, target):
        return self.body0.t_context(target)

    def __call__(self, source, target, t_ctx=None):
        if _SAMM_FUSED and alignnet_body0_supported(
                source.shape[1], source.shape[2], self.in_ch):
            h = self.body0.fused_entry(source, target, self.diff_f_and_g,
                                       use_pallas=True)
        elif _SAMM_ALGEBRAIC:
            h = self.body0.fused_entry(source, target, self.diff_f_and_g,
                                       use_pallas=False, t_ctx=t_ctx)
        else:
            # one batch-stacked IN instead of two (per-sample stats are
            # independent, so norm(stack) == stack(norms))
            b = source.shape[0]
            st = self.norm(jnp.concatenate([source, target], axis=0))
            source, target = st[:b], st[b:]
            if self.diff_f_and_g:
                h = jnp.concatenate([source - target, target], axis=-1)
            else:
                h = jnp.concatenate([source, target], axis=-1)
            h = self.body0(h)
        h = self.body1(h)
        dx = jnp.tanh(h[..., 0:1]) * self.scale
        dy = jnp.tanh(h[..., 1:2]) * self.scale
        alpha = jax.nn.sigmoid(h[..., 2:3])
        return jnp.concatenate([dx, dy, alpha], axis=-1)


class SPMWarp(nn.Module):
    """Iterative warp/mask estimator (SAMM/helpers.py:111-179)."""
    in_ch: int
    scale: float = 0.1
    cycle_align: int = 1
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    diff_f_and_g: bool = True

    def setup(self):
        self.body = AlignNet(self.in_ch, scale=self.scale,
                             diff_f_and_g=self.diff_f_and_g)
        self._kernel = make_kernel(self.blur_kernel)

    def _add(self, aligned, align):
        dx = jnp.clip(aligned[..., 0:1] + align[..., 0:1], -self.scale, self.scale)
        dy = jnp.clip(aligned[..., 1:2] + align[..., 1:2], -self.scale, self.scale)
        alpha = jnp.clip(new_prm(aligned[..., 2:3], align[..., 2:3]), 0.0, 1.0)
        return jnp.concatenate([dx, dy, alpha], axis=-1)

    def _upsample_add(self, coarse, align):
        """Cross-scale merge: flow replaced by the fine scale's, alpha
        composed through new_PRM (SAMM/helpers.py:139-147)."""
        alpha = jnp.clip(new_prm(coarse[..., 2:3], align[..., 2:3]), 0.0, 1.0)
        return jnp.concatenate([align[..., 0:1], align[..., 1:2], alpha], axis=-1)

    def __call__(self, source, target, aligned_coarse=None):
        """source: encoder feature; target: generator feature (both NHWC).
        Returns (aligned_target, align[dx,dy,alpha])."""
        h, w = source.shape[1], source.shape[2]
        # grid/position math stays fp32 even when the SAMM island runs bf16
        # (OGI_SAMM_FP32_INFER=0): near |x|~1 a bf16 grid quantizes sample
        # positions to ~half a pixel step at 256px (8-bit mantissa), which
        # is visible warping error; the flow values themselves (|dx| <=
        # scale) keep enough relative precision in bf16.
        gdt = jnp.float32 if source.dtype == jnp.bfloat16 else source.dtype
        lin_y = jnp.linspace(-1.0, 1.0, h, dtype=gdt)
        lin_x = jnp.linspace(-1.0, 1.0, w, dtype=gdt)
        base_x = jnp.broadcast_to(lin_x[None, :], (h, w))
        base_y = jnp.broadcast_to(lin_y[:, None], (h, w))

        # Cross-cycle hoist (exact math): the encoder feature `source` is
        # constant across align cycles, so its half of body0's conv1 (plus
        # its IN moments and normalized form) is computed ONCE here instead
        # of per cycle — XLA's CSE cannot do this itself because the joint
        # formulation stacks t-only and s-dependent coefficients into one
        # tensor (ops/pallas_kernels.py:alignnet_t_context).
        t_ctx = None
        if (_SAMM_TCTX and self.cycle_align > 1
                and self.body.algebraic_selected(h, w)):
            t_ctx = self.body.t_context(source)

        aligned_target = target
        accum = None
        for k in range(self.cycle_align):
            align = self.body(aligned_target, source, t_ctx=t_ctx)
            align = fir_blur(align, self._kernel.astype(align.dtype), pad=(2, 1))
            accum = align if accum is None else self._add(accum, align)
            if k == self.cycle_align - 1 and aligned_coarse is not None:
                accum = self._upsample_add(aligned_coarse, accum)
            dx, dy, alpha = (accum[..., 0].astype(gdt),
                             accum[..., 1].astype(gdt), accum[..., 2:3])
            grid = jnp.stack([base_x[None] + dx, base_y[None] + dy], axis=-1)
            p = max_disp_px(self.scale, w)
            c = target.shape[-1]
            it = jnp.dtype(target.dtype).itemsize
            mxu_on = use_mxu_warp(target.shape[0]) and h >= _MXU_WARP_MIN
            cast_all = _MXU_WARP_CAST_BF16 == "all"
            cast_fit = _MXU_WARP_CAST_BF16 in ("1", "all")
            if (mxu_on and mxu_warp_supported(h, w, c, p, it)
                    and not (cast_all and it == 4
                             and mxu_warp_supported(h, w, c, p, 2))):
                aligned_target = warp_blend_platform(target, grid, alpha, p)
            elif (mxu_on and cast_fit and it == 4
                    and mxu_warp_supported(h, w, c, p, 2)):
                # the fp32 row window blows scoped VMEM at this scale (the
                # dense-channel 128px case, PERF.md r3 probe) but bf16
                # halves it: cast the feature for the warp only — the
                # custom_vjp backward recomputes the fp32 reference, and
                # XLA's gather (the alternative) is element-rate-capped
                # batch-flat
                aligned_target = warp_blend_platform(
                    target.astype(jnp.bfloat16), grid, alpha,
                    p).astype(target.dtype)
            elif _XLA_WARP and h >= _MXU_WARP_MIN:
                aligned_target = xla_warp_blend(target, grid, alpha, p)
            else:
                warped = grid_sample_bilinear(target, grid)
                aligned_target = warped * alpha + target * (1.0 - alpha)
        return aligned_target, accum


class StyleBottleneckIR(nn.Module):
    """2x bottleneck_IR (no norm) + ModulatedConv2d + FusedLeakyReLU
    (SAMM/helpers.py:22-37). Optional btn for the modulation blocks."""
    in_ch: int
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        x = BottleneckIR(self.in_ch, self.in_ch, 1, bn=False, name="btn0")(x)
        x = BottleneckIR(self.in_ch, self.depth, 1, bn=False, name="btn1")(x)
        x = ModulatedConv2d(self.depth, self.depth, 3, dtype=self.dtype,
                            name="final_conv")(x, style)
        return FusedLeakyReLU(self.depth, name="act")(x)


class StyledScaleNShiftBlock(nn.Module):
    """One SAMM modulation block (SAMM/helpers.py:182-215). With the shipped
    configs btn is None => identity feature path; the block is SPM_Warp only.
    (The reference's unused NoiseInjection member is dropped.)"""
    in_ch: int
    out_ch: int
    warp_scale: float = 0.02
    cycle_align: int = 1
    btn: Optional[str] = None
    diff_f_and_g: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        if self.btn == "style_bottleneck_IR":
            self.btn1 = StyleBottleneckIR(self.in_ch, self.out_ch,
                                          dtype=self.dtype)
            ch = self.out_ch
        else:
            self.btn1 = None
            ch = self.in_ch
        self.alignment = SPMWarp(ch, scale=self.warp_scale,
                                 cycle_align=self.cycle_align,
                                 diff_f_and_g=self.diff_f_and_g)

    def __call__(self, feat, style, gen_feat, aligned_coarse=None):
        res = self.btn1(feat, style) if self.btn1 is not None else feat
        return self.alignment(res, gen_feat, aligned_coarse)
