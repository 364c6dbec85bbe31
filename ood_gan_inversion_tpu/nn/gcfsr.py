"""GCFSR-style generator (flax, NHWC).

Reference: src/ops/StyleGAN/GCFSR_modules.py — the third generator family
vendored by the reference (GCFSR, "Generative and Controllable Face Super
Resolution"). Structurally it is the GPEN concat-noise generator
(GCFSR_modules.py:297-314 NoiseInjection(merge='concat')) extended with

  * per-layer `FeatureModulation` (GCFSR_modules.py:284-294): when a feature
    tensor and a per-sample 2-vector sigma are supplied, the activation
    becomes source*sigma0 + conv3x3(target)*sigma1 (a learned blend of
    generator and encoder features) before the fused lrelu;
  * condition injection at selected layers via the SFT/ADD/FUSE
    `feature_modulation` function (GCFSR_modules.py:638-660) — shared with
    the main generator's non-NOISE path (nn/stylegan2.py:feature_modulation).

No shipped OOD config instantiates it (SURVEY §2.1 marks it unused), but it
is part of the reference's component inventory, so the family is available.
"""

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .stylegan2 import (ModulatedConv2d, ToRGB, STYLEGAN2_CHANNELS,
                        feature_modulation)
from .layers import EqualLinear, FusedLeakyReLU, Conv2dTorch, EqualConv2d
from ..ops.modulated import pixel_norm


class FeatureModulation(nn.Module):
    """source*sigma[:,0] + conv3x3(target)*sigma[:,1]
    (GCFSR_modules.py:284-294). Identity when target is None."""
    channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source, target=None, sigma=None):
        conv0 = EqualConv2d(self.channels, self.kernel_size, 1,
                            self.kernel_size // 2, dtype=self.dtype,
                            name="conv0")
        if target is None:
            # touch conv0 so its params exist regardless of whether a
            # feature was supplied at init time (result is DCE'd)
            conv0(jnp.zeros((1, 1, 1, self.channels), source.dtype))
            return source
        target = conv0(target)
        s0 = sigma[:, 0].reshape(-1, 1, 1, 1).astype(source.dtype)
        s1 = sigma[:, 1].reshape(-1, 1, 1, 1).astype(source.dtype)
        return source * s0 + target * s1


class StyledConvGCFSR(nn.Module):
    """ModulatedConv2d -> concat-noise -> optional FeatureModulation ->
    FusedLeakyReLU (GCFSR_modules.py:330-379)."""
    in_ch: int
    out_ch: int
    kernel_size: int = 3
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    merge: str = "concat"
    dtype: Any = jnp.float32

    def setup(self):
        self.isconcat = "concat" in self.merge
        self.ismodulation = "modulation" in self.merge
        mult = 2 if self.isconcat else 1
        self.conv = ModulatedConv2d(self.in_ch, self.out_ch, self.kernel_size,
                                    upsample=self.upsample,
                                    blur_kernel=self.blur_kernel,
                                    dtype=self.dtype)
        self.noise_weight = self.param("noise_weight", nn.initializers.zeros,
                                       (1,))
        if self.ismodulation:
            self.feat_mod = FeatureModulation(self.out_ch * mult,
                                              self.kernel_size,
                                              dtype=self.dtype)
        self.activate = FusedLeakyReLU(self.out_ch * mult)

    def __call__(self, x, style, noise=None, feat=None, sigma=None):
        out = self.conv(x, style)
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"), out.shape,
                                      out.dtype)
        w = self.noise_weight.astype(out.dtype)
        if self.isconcat:
            out = jnp.concatenate([out, w * noise], axis=-1)
        else:
            out = out + w * noise
        if self.ismodulation:
            out = self.feat_mod(out, feat, sigma)
        return self.activate(out)


class GCFSRGenerator(nn.Module):
    """Generator_GCFSR (GCFSR_modules.py:404-636). `__call__` decodes a W+
    tensor; optional per-layer feats/sigmas (feature blending) and
    SFT/ADD/FUSE conditions at `cond_ind` layers."""
    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    merge: str = "concat"
    dtype: Any = jnp.float32

    def setup(self):
        channels = STYLEGAN2_CHANNELS(self.channel_multiplier, self.narrow)
        self.channels = channels
        log_size = int(math.log2(self.size))
        self.log_size = log_size
        self.n_latent = log_size * 2 - 2
        mult = 2 if "concat" in self.merge else 1
        self.feat_multiplier = mult

        self.style = [EqualLinear(self.style_dim, lr_mul=self.lr_mlp,
                                  activation="fused_lrelu", dtype=self.dtype,
                                  name=f"style_{i}")
                      for i in range(self.n_mlp)]
        self.input = self.param("input", nn.initializers.normal(1.0),
                                (1, 4, 4, channels[4]))
        self.conv1 = StyledConvGCFSR(channels[4], channels[4], 3,
                                     blur_kernel=self.blur_kernel,
                                     merge=self.merge, dtype=self.dtype)
        self.to_rgb1 = ToRGB(channels[4] * mult, upsample=False,
                             dtype=self.dtype)

        convs, to_rgbs = [], []
        in_ch = channels[4]
        for i in range(3, log_size + 1):
            out_ch = channels[2 ** i]
            convs.append(StyledConvGCFSR(in_ch * mult, out_ch, 3,
                                         upsample=True,
                                         blur_kernel=self.blur_kernel,
                                         merge=self.merge, dtype=self.dtype))
            convs.append(StyledConvGCFSR(out_ch * mult, out_ch, 3,
                                         blur_kernel=self.blur_kernel,
                                         merge=self.merge, dtype=self.dtype))
            to_rgbs.append(ToRGB(out_ch * mult, dtype=self.dtype))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

    def style_mlp(self, z):
        w = pixel_norm(z)
        for layer in self.style:
            w = layer(w)
        return w

    def init_stub(self, latent):
        self.style_mlp(latent[:, 0, :])
        return self(latent)

    def __call__(self, latent, noise=None, feats=None, sigmas=None,
                 conditions=None, cond_ind=None, mod_type: str = "SFT"):
        """latent: (B, n_latent, style_dim) W+. noise/feats/sigmas: optional
        per-layer lists (length num_layers); conditions: list of (scale,
        shift) pairs applied at layers `cond_ind` (GCFSR_modules.py:615-621).
        Returns the RGB image."""
        num_layers = (self.log_size - 2) * 2 + 1
        noise = noise if noise is not None else [None] * num_layers
        feats = feats if feats is not None else [None] * num_layers
        sigmas = sigmas if sigmas is not None else [None] * num_layers

        out = jnp.tile(self.input.astype(latent.dtype),
                       (latent.shape[0], 1, 1, 1))
        out = self.conv1(out, latent[:, 0], noise=noise[0], feat=feats[0],
                         sigma=sigmas[0])
        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        for idx in range(len(self.to_rgbs)):
            out = self.convs[2 * idx](out, latent[:, i],
                                      noise=noise[1 + 2 * idx],
                                      feat=feats[1 + 2 * idx],
                                      sigma=sigmas[1 + 2 * idx])
            if cond_ind is not None and i in cond_ind and conditions is not None:
                out = feature_modulation(out, conditions[cond_ind.index(i)],
                                         mod_type=mod_type)
            out = self.convs[2 * idx + 1](out, latent[:, i + 1],
                                          noise=noise[2 + 2 * idx],
                                          feat=feats[1 + 2 * idx],
                                          sigma=sigmas[2 + 2 * idx])
            skip = self.to_rgbs[idx](out, latent[:, i + 2], skip)
            i += 2
        return skip
