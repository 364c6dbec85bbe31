"""GPEN-variant StyleGAN2 generator (concat-noise), flax NHWC.

Reference: src/ops/StyleGAN/modules.py:284-540 — the second generator family
vendored by the reference ("GPEN"): NoiseInjection CONCATENATES the weighted
full-channel noise (doubling the feature width feeding each next conv,
feat_multiplier=2) and the channel table carries the `narrow` factor. No
shipped OOD config instantiates it, but it is part of the reference's model
inventory (SURVEY §2.1), so the family is available here too.
"""

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .stylegan2 import ModulatedConv2d, ToRGB, STYLEGAN2_CHANNELS
from .layers import EqualLinear, FusedLeakyReLU
from ..ops.modulated import pixel_norm


class NoiseConcat(nn.Module):
    """out = concat([image, w * noise]) with full-channel noise
    (modules.py:284-300)."""

    @nn.compact
    def __call__(self, image, noise=None):
        w = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"), image.shape,
                                      image.dtype)
        return jnp.concatenate([image, w.astype(image.dtype) * noise], axis=-1)


class StyledConvGPEN(nn.Module):
    in_ch: int
    out_ch: int
    kernel_size: int = 3
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    isconcat: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.conv = ModulatedConv2d(self.in_ch, self.out_ch, self.kernel_size,
                                    upsample=self.upsample,
                                    blur_kernel=self.blur_kernel,
                                    dtype=self.dtype)
        self.noise = (NoiseConcat() if self.isconcat else None)
        mult = 2 if self.isconcat else 1
        self.activate = FusedLeakyReLU(self.out_ch * mult)

    def __call__(self, x, style, noise=None):
        out = self.conv(x, style)
        if self.noise is not None:
            out = self.noise(out, noise=noise)
        else:
            w = self.param("noise_weight", nn.initializers.zeros, (1,))
            if noise is None:
                noise = jax.random.normal(self.make_rng("noise"), out.shape,
                                          out.dtype)
            out = out + w.astype(out.dtype) * noise
        return self.activate(out)


class GPENGenerator(nn.Module):
    """modules.py:379-540 synthesis net; channel width after each StyledConv
    is out_ch * 2 (concat noise)."""
    size: int = 256
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    isconcat: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    dtype: Any = jnp.float32

    def setup(self):
        channels = STYLEGAN2_CHANNELS(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.size))
        self.n_latent = log_size * 2 - 2
        mult = 2 if self.isconcat else 1

        self.style = [EqualLinear(self.style_dim, lr_mul=self.lr_mlp,
                                  activation="fused_lrelu", dtype=self.dtype,
                                  name=f"style_{i}") for i in range(self.n_mlp)]
        self.input = self.param("input", nn.initializers.normal(1.0),
                                (1, 4, 4, channels[4]))
        self.conv1 = StyledConvGPEN(channels[4], channels[4], 3,
                                    isconcat=self.isconcat,
                                    blur_kernel=self.blur_kernel,
                                    dtype=self.dtype)
        self.to_rgb1 = ToRGB(channels[4] * mult, upsample=False,
                             dtype=self.dtype)
        convs, to_rgbs = [], []
        in_ch = channels[4]
        for i in range(3, log_size + 1):
            out_ch = channels[2 ** i]
            convs.append(StyledConvGPEN(in_ch * mult, out_ch, 3, upsample=True,
                                        isconcat=self.isconcat,
                                        blur_kernel=self.blur_kernel,
                                        dtype=self.dtype))
            convs.append(StyledConvGPEN(out_ch * mult, out_ch, 3,
                                        isconcat=self.isconcat,
                                        blur_kernel=self.blur_kernel,
                                        dtype=self.dtype))
            to_rgbs.append(ToRGB(out_ch * mult, dtype=self.dtype))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

    def style_mlp(self, z):
        w = pixel_norm(z)
        for layer in self.style:
            w = layer(w)
        return w

    def __call__(self, latent, noise=None):
        if noise is None:
            noise = [None] * (len(self.convs) + 1)
        out = jnp.tile(self.input.astype(latent.dtype),
                       (latent.shape[0], 1, 1, 1))
        out = self.conv1(out, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])
        i = 1
        for idx in range(len(self.to_rgbs)):
            out = self.convs[2 * idx](out, latent[:, i], noise=noise[1 + 2 * idx])
            out = self.convs[2 * idx + 1](out, latent[:, i + 1],
                                          noise=noise[2 + 2 * idx])
            skip = self.to_rgbs[idx](out, latent[:, i + 2], skip)
            i += 2
        return skip
