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
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import Conv2dTorch, EqualLinear
from ..irse import IRSETrunk, trunk_taps
from ...ops.resize import resize_bicubic_ac

PROGRESSIVE_INFERENCE = 18  # ProgressiveStage.Inference (psp_encoders.py:32)


def _upsample_add(x, y):
    """Bicubic align_corners=True FPN merge (e4e/encoders/helpers.py:504-522)."""
    return resize_bicubic_ac(x, (y.shape[1], y.shape[2])) + y


class GradualStyleBlock(nn.Module):
    """log2(spatial) stride-2 convs + LeakyReLU(0.01) + EqualLinear
    (psp_encoders.py:35-56)."""
    out_c: int = 512
    spatial: int = 16

    @nn.compact
    def __call__(self, x):
        num_pools = int(math.log2(self.spatial))
        for i in range(num_pools):
            x = Conv2dTorch(self.out_c, 3, 2, 1, name=f"conv_{i}")(x)
            x = jnp.where(x >= 0, x, 0.01 * x)  # torch LeakyReLU default
        x = x.reshape(x.shape[0], -1)
        return EqualLinear(self.out_c, name="linear")(x)


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

        w0 = self.styles[0](c3)
        deltas = [jnp.zeros_like(w0)]
        features = c3
        p2 = None
        for i in range(1, min(stage + 1, self.style_count)):
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
