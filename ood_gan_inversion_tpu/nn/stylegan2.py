"""StyleGAN2 generator / discriminator (flax linen, NHWC, MXU-shaped).

Re-design of the reference rosinality-style stack (src/ops/StyleGAN/model.py:
178-740). Differences that make it TPU-native rather than a port:

  * ModulatedConv2d uses the scaled-input/scaled-output rewrite
    (ood_gan_inversion_tpu/ops/modulated.py) — one batched conv on the MXU
    instead of groups=batch.
  * All submodules are setup()-defined and individually callable, so the OOD
    arch drives the layer loop itself and splices SAMM alignment in as
    explicit dataflow — replacing the reference's NoiseInjection Python
    callback + mutable `self.aligns` (model.py:283-292,
    src/archs/OOD_faceGAN_e4e_arch.py:224-242).
  * Noise is drawn from the 'noise' PRNG collection (threaded keys), never
    from hidden global RNG state.

The callback algebra collapses: the reference computes
condition = (aligned - image + n*w)/w and then image + w*condition, which is
exactly `aligned + w*n` — that identity is applied directly here.
"""

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.modulated import modulated_conv2d, pixel_norm
from ..ops.upfirdn2d import make_kernel, upsample2x
from ..ops.stats import minibatch_stddev
from .layers import EqualLinear, FusedLeakyReLU, ConvLayer, ResBlock


def STYLEGAN2_CHANNELS(channel_multiplier: int = 2, narrow: float = 1.0):
    """Reference channel table (model.py:402-412)."""
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow),
        64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
        2048: int(8 * channel_multiplier * narrow),
    }


class ModulatedConv2d(nn.Module):
    """Reference ModulatedConv2d (model.py:178-274), MXU rewrite."""
    in_ch: int
    out_ch: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Any = jnp.float32

    def setup(self):
        self.weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.kernel_size, self.kernel_size, self.in_ch, self.out_ch))
        self.modulation = EqualLinear(self.in_ch, bias_init=1.0,
                                      dtype=self.dtype, name="modulation")
        self._kernel = make_kernel(self.blur_kernel)

    def __call__(self, x, style):
        s = self.modulation(style)                       # (B, in_ch)
        return modulated_conv2d(x, self.weight, s,
                                demodulate=self.demodulate,
                                upsample=self.upsample,
                                downsample=self.downsample,
                                blur_kernel=self._kernel)


class NoiseInjection(nn.Module):
    """out = image + weight * noise; noise (B,H,W,1) from the 'noise' rng
    stream when not supplied (reference model.py:277-292)."""

    @nn.compact
    def __call__(self, image, noise=None):
        w = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None:
            b, h, wd, _ = image.shape
            noise = jax.random.normal(self.make_rng("noise"), (b, h, wd, 1),
                                      dtype=image.dtype)
        return image + w.astype(image.dtype) * noise


class StyledConv(nn.Module):
    """ModulatedConv2d -> NoiseInjection -> FusedLeakyReLU (model.py:308-350).
    Submodules are exposed so the OOD arch can interleave SAMM between the
    conv and the activation."""
    in_ch: int
    out_ch: int
    kernel_size: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True
    noise_injection: bool = True
    activation: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.conv = ModulatedConv2d(self.in_ch, self.out_ch, self.kernel_size,
                                    demodulate=self.demodulate,
                                    upsample=self.upsample,
                                    blur_kernel=self.blur_kernel,
                                    dtype=self.dtype)
        if self.noise_injection:
            self.noise = NoiseInjection()
        if self.activation:
            self.activate = FusedLeakyReLU(self.out_ch)

    def __call__(self, x, style, noise=None):
        out = self.conv(x, style)
        if self.noise_injection:
            out = self.noise(out, noise=noise)
        if self.activation:
            out = self.activate(out)
        return out


class ToRGB(nn.Module):
    """model.py:353-372."""
    in_ch: int
    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Any = jnp.float32

    def setup(self):
        self.conv = ModulatedConv2d(self.in_ch, 3, 1, demodulate=False,
                                    dtype=self.dtype)
        self.bias = self.param("bias", nn.initializers.zeros, (3,))
        self._kernel = make_kernel(self.blur_kernel)

    def __call__(self, x, style, skip=None):
        out = self.conv(x, style)
        out = out + self.bias.astype(out.dtype)
        if skip is not None:
            skip = upsample2x(skip, self._kernel.astype(skip.dtype))
            out = out + skip
        return out


class Generator(nn.Module):
    """StyleGAN2 synthesis + style MLP (model.py:375-585).

    `__call__(latent)` decodes a W+ tensor (B, n_latent, style_dim). The
    multi-style mixing / truncation conveniences live in the arch layer; the
    SAMM-conditioned decode is the arch's own loop over these submodules.
    """
    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    dtype: Any = jnp.float32

    def setup(self):
        channels = STYLEGAN2_CHANNELS(self.channel_multiplier, self.narrow)
        self.channels = channels
        log_size = int(math.log2(self.size))
        self.log_size = log_size
        self.num_layers = (log_size - 2) * 2 + 1
        self.n_latent = log_size * 2 - 2

        self.style = [EqualLinear(self.style_dim, lr_mul=self.lr_mlp,
                                  activation="fused_lrelu", dtype=self.dtype,
                                  name=f"style_{i}")
                      for i in range(self.n_mlp)]
        self.input = self.param("input", nn.initializers.normal(1.0),
                                (1, 4, 4, channels[4]))
        self.conv1 = StyledConv(channels[4], channels[4], 3,
                                blur_kernel=self.blur_kernel, dtype=self.dtype)
        self.to_rgb1 = ToRGB(channels[4], upsample=False, dtype=self.dtype)

        convs, to_rgbs = [], []
        in_ch = channels[4]
        for i in range(3, log_size + 1):
            out_ch = channels[2 ** i]
            convs.append(StyledConv(in_ch, out_ch, 3, upsample=True,
                                    blur_kernel=self.blur_kernel,
                                    dtype=self.dtype))
            convs.append(StyledConv(out_ch, out_ch, 3,
                                    blur_kernel=self.blur_kernel,
                                    dtype=self.dtype))
            to_rgbs.append(ToRGB(out_ch, dtype=self.dtype))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

    def style_mlp(self, z):
        """W = MLP(pixel_norm(z)) (model.py:391-400)."""
        w = pixel_norm(z)
        for layer in self.style:
            w = layer(w)
        return w

    def init_stub(self, latent):
        """Touch every submodule so a single init() creates all params
        (style MLP is not on the plain decode path)."""
        self.style_mlp(latent[:, 0, :])
        return self(latent)

    def const_input(self, batch: int, dtype=None):
        w = self.input if dtype is None else self.input.astype(dtype)
        return jnp.tile(w, (batch, 1, 1, 1))

    def __call__(self, latent, noise=None):
        """Plain (unconditioned) decode of W+ (B, n_latent, style_dim)."""
        if noise is None:
            noise = [None] * self.num_layers
        out = self.const_input(latent.shape[0], latent.dtype)
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


class Discriminator(nn.Module):
    """StyleGAN2 discriminator returning (score, [body_feat, final_feat]),
    i.e. the `StyleGAN2Discriminator_mod` contract
    (src/ops/StyleGAN/stylegan2_arch.py:766-836 /
    src/archs/Discriminator_arch.py:22-25)."""
    size: int = 1024
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    stddev_feat: int = 1
    narrow: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = STYLEGAN2_CHANNELS(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.size))
        features = []
        out = ConvLayer(channels[self.size], 1, dtype=self.dtype,
                        name="conv0")(x)
        for i in range(log_size, 2, -1):
            out = ResBlock(channels[2 ** (i - 1)], self.blur_kernel,
                           dtype=self.dtype, name=f"res_{i}")(out)
        features.append(out)

        out = minibatch_stddev(out, self.stddev_group, self.stddev_feat)
        out = ConvLayer(channels[4], 3, dtype=self.dtype,
                        name="final_conv")(out)
        features.append(out)

        b = out.shape[0]
        # Reference flattens NCHW (c,h,w); transpose so converted torch
        # final_linear weights line up.
        flat = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, -1)
        h = EqualLinear(channels[4], activation="fused_lrelu",
                        dtype=self.dtype, name="final_linear0")(flat)
        score = EqualLinear(1, dtype=self.dtype, name="final_linear1")(h)
        return score, features
