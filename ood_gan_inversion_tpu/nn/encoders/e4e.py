"""E4E (encoder4editing) encoder: IR-SE-50 trunk + FPN + per-layer W deltas.

Reference: src/ops/e4e/encoders/psp_encoders.py:35-56 (GradualStyleBlock),
125-216 (Encoder4Editing). Returns W+ (B, style_count, 512) and the feature
pyramid taps consumed by SAMM (input-layer 256px/64ch, body-2 128px/64ch,
body-6 64px/128ch, body-20 32px/256ch, body-23 16px/512ch).

Progressive W-training stage is a *static* argument (compile-time), matching
the reference's ProgressiveStage enum; the shipped configs run at Inference
(all deltas active), so stage changes cost at most style_count recompiles.
"""

import math
import os
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..layers import Conv2dTorch, Conv2dTorchS, EqualLinear, EqualLinearS
from ..irse import IRSETrunk, trunk_taps
from ...ops.resize import resize_bicubic_ac

PROGRESSIVE_INFERENCE = 18  # ProgressiveStage.Inference (psp_encoders.py:32)

# Grouped style-head evaluation (round 4): at Inference stage the encoder
# runs up to 18 GradualStyleBlocks — ~80 narrow sequential 512x512 convs
# whose b=1 MXU utilization is terrible. Blocks 0-2 / 3-6 / 7-17 share the
# same input map and the same architecture, so each group evaluates as ONE
# wide conv at level 0 (shared input, out-channels concatenated) and one
# fused op per deeper level — exact same dot products, one op per level
# instead of one per block. Recorded end-to-end A/B LOST at b=1 in BOTH
# formulations (+1.2 ms grouped-conv, +0.9 ms tap-matmul) and was neutral
# at b=8 (PERF.md r4 A/B matrix) — the style heads are not the b=1
# bottleneck and the regrouping perturbs XLA's fusion — so the default is
# OFF; OGI_E4E_GROUPED=1 enables for A/B.
_E4E_GROUPED = os.environ.get("OGI_E4E_GROUPED", "0") == "1"
# Deeper-level formulation: "matmul" extracts the 9 stride-2 taps as slices
# and contracts one batched (n, rows, 9C) x (n, 9C, C) dot (explicit
# layout, no grouped-conv lowering); "conv" uses feature_group_count=n
# convs (XLA's grouped-conv lowering regressed b=1 by ~6 ms/img on the
# real chip — PERF.md r4 A/B).
_E4E_GROUP_MODE = os.environ.get("OGI_E4E_GROUP_MODE", "matmul")


def _upsample_add(x, y):
    """Bicubic align_corners=True FPN merge (e4e/encoders/helpers.py:504-522)."""
    return resize_bicubic_ac(x, (y.shape[1], y.shape[2])) + y


def _leaky(x):
    return jnp.where(x >= 0, x, 0.01 * x)  # torch LeakyReLU default


class GradualStyleBlock(nn.Module):
    """log2(spatial) stride-2 convs + LeakyReLU(0.01) + EqualLinear
    (psp_encoders.py:35-56). setup-style so grouped evaluation
    (styles_grouped) can read the conv/linear params without invoking the
    module; param tree identical to the previous compact form
    (conv_0..conv_{n-1}, linear)."""
    out_c: int = 512
    spatial: int = 16
    in_c: int = 512

    def setup(self):
        self.num_pools = int(math.log2(self.spatial))
        # a list attribute named `conv` yields scope names conv_0..conv_{n-1}
        self.conv = [Conv2dTorchS(self.in_c if i == 0 else self.out_c,
                                  self.out_c, 3, 2, 1)
                     for i in range(self.num_pools)]
        self.linear = EqualLinearS(self.out_c, self.out_c)

    def __call__(self, x):
        for i in range(self.num_pools):
            x = _leaky(self.conv[i](x))
        x = x.reshape(x.shape[0], -1)
        return self.linear(x)


def _grouped_s2_conv_matmul(y, ws, n):
    """Grouped stride-2 3x3 conv (pad 1) as one batched matmul.

    y: (B, h, w, n*c) group-major channels; ws: (n, 3, 3, c, c). Extracts
    the 9 kernel taps as strided slices of the padded input, stacks them as
    (B, oh, ow, 9, n, c), and contracts taps+c against the per-group kernel
    in a single dot_general with n as a batch dim — the exact same dot
    products as n separate convs, but one MXU op."""
    bsz, h, w, nc = y.shape
    c = nc // n
    oh, ow = (h + 1) // 2, (w + 1) // 2
    yp = jnp.pad(y, [(0, 0), (1, 1), (1, 1), (0, 0)])
    taps = [yp[:, kh:kh + h:2, kw:kw + w:2, :]
            for kh in range(3) for kw in range(3)]
    p = jnp.stack(taps, axis=3).reshape(bsz, oh, ow, 9, n, c)
    # ws (n,3,3,c,c) -> (n, 9*c, c); k index = (kh*3+kw)*c + cc
    wm = ws.reshape(ws.shape[0], 9 * c, c)
    p = p.transpose(0, 1, 2, 4, 3, 5).reshape(bsz, oh, ow, n, 9 * c)
    out = jnp.einsum("bhwnk,nkd->bhwnd", p, wm,
                     preferred_element_type=jnp.float32).astype(y.dtype)
    return out.reshape(bsz, oh, ow, n * c)


def styles_grouped(blocks, x):
    """Evaluate n architecturally-identical GradualStyleBlocks on the SAME
    input map as one fused chain: level 0 is a single wide conv (the input
    is shared, so concatenating the blocks' out-channels is exactly the
    same set of dot products); deeper levels are feature_group_count=n
    grouped convs (each group = one block's conv, disjoint channels); the
    final EqualLinears become one batched matmul. Returns the list of
    (B, out_c) outputs in block order. Exact math vs the sequential loop —
    only the op grouping changes."""
    n = len(blocks)
    if n == 1:
        return [blocks[0](x)]
    num_pools = blocks[0].num_pools
    dt = x.dtype
    w0 = jnp.concatenate([b.conv[0].weight for b in blocks], axis=-1)
    b0 = jnp.concatenate([b.conv[0].bias for b in blocks])
    y = lax.conv_general_dilated(
        x, w0.astype(dt), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = _leaky(y + b0.astype(dt).reshape(1, 1, 1, -1))
    for lvl in range(1, num_pools):
        bl = jnp.concatenate([b.conv[lvl].bias for b in blocks])
        if _E4E_GROUP_MODE == "conv":
            wl = jnp.concatenate([b.conv[lvl].weight for b in blocks],
                                 axis=-1)
            y = lax.conv_general_dilated(
                y, wl.astype(dt), (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=n)
        else:
            # stride-2 3x3 grouped conv as 9 shifted slices + ONE batched
            # matmul (n, rows, 9C) x (n, 9C, C): explicit layout, MXU-shaped
            ws = jnp.stack([b.conv[lvl].weight for b in blocks])
            y = _grouped_s2_conv_matmul(y, ws.astype(dt), n)
        y = _leaky(y + bl.astype(dt).reshape(1, 1, 1, -1))
    bsz = x.shape[0]
    y = y.reshape(bsz, n, -1)                       # 1x1 spatial: (B, n, C)
    wlin = jnp.stack([b.linear.weight for b in blocks])       # (n, C, C)
    blin = jnp.stack([b.linear.bias * b.linear.lr_mul for b in blocks])
    scale = (1.0 / math.sqrt(wlin.shape[1])) * blocks[0].linear.lr_mul
    out = jnp.einsum("bnk,nkd->bnd", y, (wlin * scale).astype(dt))
    out = out + blin.astype(out.dtype)[None]
    return [out[:, j] for j in range(n)]


class Encoder4Editing(nn.Module):
    num_layers: int = 50
    mode: str = "ir_se"
    stylegan_size: int = 1024
    bn: Any = True

    def setup(self):
        self.trunk = IRSETrunk(self.num_layers, self.mode, bn=self.bn)
        log_size = int(math.log2(self.stylegan_size))
        self.style_count = 2 * log_size - 2
        self.coarse_ind = 3
        self.middle_ind = 7
        styles = []
        for i in range(self.style_count):
            spatial = 16 if i < self.coarse_ind else (32 if i < self.middle_ind else 64)
            styles.append(GradualStyleBlock(512, spatial, name=f"style_{i}"))
        self.styles = styles
        self.latlayer1 = Conv2dTorch(512, 1, 1, 0)
        self.latlayer2 = Conv2dTorch(512, 1, 1, 0)
        # encoder channel inventory used by the arch's feats_conv
        self.channels = [64, 64, 128, 256, 512]

    def __call__(self, x, stage: int = PROGRESSIVE_INFERENCE):
        _, feats = self.trunk(x, taps=trunk_taps(self.num_layers))
        # feats: [input 256px/64, 128px/64, 64px/128, 32px/256, 16px/512]
        c1, c2, c3 = feats[2], feats[3], feats[4]

        n_active = min(stage + 1, self.style_count)
        if _E4E_GROUPED and n_active == self.style_count:
            # Inference-stage fast path: evaluate the style heads in three
            # shared-input groups (see styles_grouped). The FPN maps are
            # still built lazily in the same order as the loop below.
            outs = styles_grouped(
                self.styles[:min(self.coarse_ind, self.style_count)], c3)
            if self.style_count > self.coarse_ind:
                p2 = _upsample_add(c3, self.latlayer1(c2))
                outs += styles_grouped(
                    self.styles[self.coarse_ind:
                                min(self.middle_ind, self.style_count)], p2)
            if self.style_count > self.middle_ind:
                p1 = _upsample_add(p2, self.latlayer2(c1))
                outs += styles_grouped(self.styles[self.middle_ind:], p1)
            w0 = outs[0]
            deltas = [jnp.zeros_like(w0)] + outs[1:]
            w = w0[:, None, :] + jnp.stack(deltas, axis=1)
            return w, feats

        w0 = self.styles[0](c3)
        deltas = [jnp.zeros_like(w0)]
        features = c3
        p2 = None
        for i in range(1, n_active):
            if i == self.coarse_ind:
                p2 = _upsample_add(c3, self.latlayer1(c2))
                features = p2
            elif i == self.middle_ind:
                p1 = _upsample_add(p2, self.latlayer2(c1))
                features = p1
            deltas.append(self.styles[i](features))
        for _ in range(len(deltas), self.style_count):
            deltas.append(jnp.zeros_like(w0))
        w = w0[:, None, :] + jnp.stack(deltas, axis=1)
        return w, feats


class GradualStyleEncoder(nn.Module):
    """pSp FPN encoder (psp_encoders.py:59-122): all style_count W vectors
    predicted independently — coarse styles from the 16px map, middle from
    the FPN-merged 32px map, fine from the 64px map (no w0+delta structure,
    unlike Encoder4Editing)."""
    num_layers: int = 50
    mode: str = "ir_se"
    stylegan_size: int = 1024
    bn: Any = True

    def setup(self):
        self.trunk = IRSETrunk(self.num_layers, self.mode, bn=self.bn)
        log_size = int(math.log2(self.stylegan_size))
        self.style_count = 2 * log_size - 2
        self.coarse_ind = 3
        self.middle_ind = 7
        styles = []
        for i in range(self.style_count):
            spatial = (16 if i < self.coarse_ind
                       else (32 if i < self.middle_ind else 64))
            styles.append(GradualStyleBlock(512, spatial, name=f"style_{i}"))
        self.styles = styles
        self.latlayer1 = Conv2dTorch(512, 1, 1, 0)
        self.latlayer2 = Conv2dTorch(512, 1, 1, 0)

    def __call__(self, x):
        _, feats = self.trunk(x, taps=trunk_taps(self.num_layers)[1:])
        c1, c2, c3 = feats[1], feats[2], feats[3]
        if _E4E_GROUPED:
            latents = styles_grouped(self.styles[:self.coarse_ind], c3)
            p2 = _upsample_add(c3, self.latlayer1(c2))
            latents += styles_grouped(
                self.styles[self.coarse_ind:self.middle_ind], p2)
            p1 = _upsample_add(p2, self.latlayer2(c1))
            latents += styles_grouped(self.styles[self.middle_ind:], p1)
            return jnp.stack(latents, axis=1)
        latents = [self.styles[j](c3) for j in range(self.coarse_ind)]
        p2 = _upsample_add(c3, self.latlayer1(c2))
        latents += [self.styles[j](p2)
                    for j in range(self.coarse_ind, self.middle_ind)]
        p1 = _upsample_add(p2, self.latlayer2(c1))
        latents += [self.styles[j](p1)
                    for j in range(self.middle_ind, self.style_count)]
        return jnp.stack(latents, axis=1)


class BackboneEncoderUsingLastLayerIntoW(nn.Module):
    """Single-W encoder (psp_encoders.py:219-249): trunk -> global average
    pool -> EqualLinear -> W repeated to W+."""
    num_layers: int = 50
    mode: str = "ir_se"
    stylegan_size: int = 1024
    bn: Any = True

    def setup(self):
        self.trunk = IRSETrunk(self.num_layers, self.mode, bn=self.bn)
        self.linear = EqualLinear(512)
        log_size = int(math.log2(self.stylegan_size))
        self.style_count = 2 * log_size - 2

    def __call__(self, x):
        y, _ = self.trunk(x, taps=())
        w = self.linear(jnp.mean(y, axis=(1, 2)))
        return jnp.tile(w[:, None, :], (1, self.style_count, 1))
