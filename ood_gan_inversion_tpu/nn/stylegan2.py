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
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.modulated import modulated_conv2d, demod_scale, pixel_norm
from ..ops.upfirdn2d import make_kernel, upsample2x
from ..ops.fused_act import fused_leaky_relu
from ..ops.stats import minibatch_stddev
from ..parallel.spatial import constrain as sp_constrain
from ..ops.polyphase import (pack_space_to_depth, unpack_depth_to_space,
                             upconv_blur_packed_kernel, conv3x3_packed_kernel,
                             conv1x1_packed_kernel, skip_up_packed_kernel,
                             conv_packed, tile_phase_major)
from ..ops.pallas_kernels import (fused_packed_pair, pallas_pair_supported,
                                  fused_packed_stage, pallas_stage_supported)
from .layers import EqualLinear, FusedLeakyReLU, ConvLayer, ResBlock

# Polyphase-packed decode of the >=512px generator stages (see
# ops/polyphase.py). Same math, 4x better MXU lane utilization; default on,
# OGI_PACKED_TAIL=0 restores the naive fine-resolution path.
_PACKED_TAIL = os.environ.get("OGI_PACKED_TAIL", "1") == "1"
_PACKED_MIN_RES = 512
# Fused Pallas kernel for the packed conv pair (ops/pallas_kernels.py).
# Isolated it beats the XLA packed chain ~1.7x, but end-to-end the opaque
# custom-call blocks XLA's cross-stage fusion and measures ~0.5 ms SLOWER
# (29.50 XLA vs 30.04 Pallas ms/img, PERF.md A/B) — default off until the
# whole stage (pair + toRGB + skip) lands in one kernel.
_PALLAS_PAIR = os.environ.get("OGI_PALLAS", "0") == "1"


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
    stream when not supplied (reference model.py:277-292). setup-style so the
    packed polyphase decode path can read `.weight` without invoking it."""

    def setup(self):
        self.weight = self.param("weight", nn.initializers.zeros, (1,))

    def __call__(self, image, noise=None):
        if noise is None:
            b, h, wd, _ = image.shape
            noise = jax.random.normal(self.make_rng("noise"), (b, h, wd, 1),
                                      dtype=image.dtype)
        return image + self.weight.astype(image.dtype) * noise


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

    def stage_is_packable(self, idx: int) -> bool:
        """A layer pair runs phase-packed when its output resolution is high
        enough that its channel count (<=64) underutilizes the MXU lanes."""
        return (_PACKED_TAIL and 2 ** (idx + 3) >= _PACKED_MIN_RES
                and self.convs[2 * idx].conv.kernel_size == 3
                and self.convs[2 * idx].conv.upsample)

    def packed_stage(self, idx, out, skip, l0, l1, l2, noise_a=None,
                     noise_b=None, unpack_out=True):
        """One generator layer pair + ToRGB, computed phase-packed at the
        COARSE (input) resolution — exact same linear algebra as
        convs[2i] -> convs[2i+1] -> to_rgbs[i] (ops/polyphase.py has the
        kernel derivations; tests/test_polyphase.py pins parity).

        out: (B, H, W, Cin) coarse activation; skip: (B, H, W, 3) coarse RGB.
        noise_a/noise_b: optional FINE-res (B, 2H, 2W, 1) noise; drawn packed
        from the 'noise' rng stream when omitted.
        Returns (out_fine [or packed when unpack_out=False], skip_fine)."""
        conv_a, conv_b = self.convs[2 * idx], self.convs[2 * idx + 1]
        to_rgb = self.to_rgbs[idx]
        ca, cb, cr = conv_a.conv, conv_b.conv, to_rgb.conv
        b, h, w, cin = out.shape
        cmid = ca.out_ch
        dt = out.dtype

        def packed_noise(noise, noise_mod):
            n = (jax.random.normal(self.make_rng("noise"), (b, h, w, 4),
                                   jnp.float32)
                 if noise is None
                 else pack_space_to_depth(noise.astype(jnp.float32)))
            return n * noise_mod.weight.astype(jnp.float32)

        # conv_a: modulated upsample-conv + FIR blur as one packed 3x3 conv
        s_a = ca.modulation(l0)
        w_a = ca.weight * (1.0 / math.sqrt(cin * 9))
        d_a = demod_scale(w_a, s_a)
        k1 = upconv_blur_packed_kernel(w_a, ca._kernel)
        # conv_b: same-resolution modulated 3x3, packed 4C -> 4C
        s_b = cb.modulation(l1)
        w_b = cb.weight * (1.0 / math.sqrt(cmid * 9))
        d_b = demod_scale(w_b, s_b)
        w_b_packed = conv3x3_packed_kernel(w_b)

        cdt = (jnp.bfloat16
               if dt == jnp.float32 and jax.default_backend() != "cpu"
               else dt)
        # the whole-stage kernel measured 18.65 MB scoped VMEM at the real
        # 1024px shapes (over the 16 MB limit) — its own opt-in until the
        # band estimator accounts for Mosaic's double buffering
        use_stage_kernel = (_PALLAS_PAIR
                            and os.environ.get("OGI_PALLAS_STAGE", "0") == "1"
                            and pallas_stage_supported(
                                h, w, cin, 4 * cmid, jnp.dtype(cdt).itemsize))
        if use_stage_kernel:
            # whole stage in ONE Pallas kernel: conv pair (demod + noise +
            # bias + lrelu fused per conv) + toRGB + packed skip upsample,
            # intermediate activation in VMEM scratch. bf16 matmul inputs on
            # TPU = XLA's DEFAULT conv precision for fp32; accumulation is
            # fp32 inside the kernel.
            s_r = cr.modulation(l2)
            w_r = cr.weight * (1.0 / math.sqrt(cmid))
            k3 = conv1x1_packed_kernel(w_r)[0, 0]            # (4C, 12)
            k3sr = (tile_phase_major(s_r)[:, :, None] * k3[None]).astype(cdt)
            k4 = skip_up_packed_kernel(to_rgb._kernel, 3, cdt)
            skip_in = (skip.astype(cdt) if skip is not None
                       else jnp.zeros((b, h, w, 3), cdt))
            rgb, z2 = fused_packed_stage(
                out.astype(cdt),
                packed_noise(noise_a, conv_a.noise),
                packed_noise(noise_b, conv_b.noise),
                skip_in,
                k1.astype(cdt), s_a, tile_phase_major(d_a),
                tile_phase_major(conv_a.activate.bias),
                w_b_packed.astype(cdt), tile_phase_major(s_b),
                tile_phase_major(d_b),
                tile_phase_major(conv_b.activate.bias),
                k3sr, tile_phase_major(to_rgb.bias), k4)
            skip_fine = unpack_depth_to_space(rgb.astype(dt), 3)
            z2 = z2.astype(dt)
            out_next = unpack_depth_to_space(z2, cmid) if unpack_out else z2
            return out_next, skip_fine
        if _PALLAS_PAIR and pallas_pair_supported(h, w, cin, 4 * cmid,
                                                  jnp.dtype(cdt).itemsize):
            # fused Pallas kernels: conv + demod + noise + bias + lrelu per
            # HBM round trip. bf16 matmul inputs on TPU = XLA's DEFAULT conv
            # precision for fp32; accumulation is fp32 inside the kernel.
            z2 = fused_packed_pair(
                out.astype(cdt),
                packed_noise(noise_a, conv_a.noise),
                packed_noise(noise_b, conv_b.noise),
                k1.astype(cdt), s_a, tile_phase_major(d_a),
                tile_phase_major(conv_a.activate.bias),
                w_b_packed.astype(cdt), tile_phase_major(s_b),
                tile_phase_major(d_b),
                tile_phase_major(conv_b.activate.bias)).astype(dt)
        else:
            def add_noise_lrelu(z, n_packed, act):
                c = z.shape[-1] // 4
                z = (z.reshape(b, h, w, 4, c)
                     + n_packed.astype(dt)[..., None]).reshape(b, h, w, 4 * c)
                return fused_leaky_relu(z, tile_phase_major(act.bias))

            z = conv_packed(out * s_a[:, None, None, :].astype(dt),
                            k1.astype(dt))
            z = z * tile_phase_major(d_a.astype(dt))[:, None, None, :]
            z = add_noise_lrelu(z, packed_noise(noise_a, conv_a.noise),
                                conv_a.activate)
            z2 = conv_packed(z * tile_phase_major(s_b.astype(dt))[:, None, None, :],
                             w_b_packed.astype(dt))
            z2 = z2 * tile_phase_major(d_b.astype(dt))[:, None, None, :]
            z2 = add_noise_lrelu(z2, packed_noise(noise_b, conv_b.noise),
                                 conv_b.activate)

        # to_rgb (1x1, no demod) + packed FIR upsample of the skip
        s_r = cr.modulation(l2).astype(dt)
        w_r = cr.weight * (1.0 / math.sqrt(cmid))
        k3 = conv1x1_packed_kernel(w_r).astype(dt)
        rgb = conv_packed(z2 * tile_phase_major(s_r)[:, None, None, :], k3,
                          padding=0)
        rgb = rgb + tile_phase_major(to_rgb.bias).astype(dt)
        if skip is not None:
            k4 = skip_up_packed_kernel(to_rgb._kernel, 3, dt)
            rgb = rgb + conv_packed(skip, k4)
        skip_fine = unpack_depth_to_space(rgb, 3)
        out_next = unpack_depth_to_space(z2, cmid) if unpack_out else z2
        return out_next, skip_fine

    def __call__(self, latent, noise=None, packed=None):
        """Plain (unconditioned) decode of W+ (B, n_latent, style_dim)."""
        if noise is None:
            noise = [None] * self.num_layers
        if packed is None:
            packed = _PACKED_TAIL
        out = self.const_input(latent.shape[0], latent.dtype)
        out = self.conv1(out, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])
        i = 1
        for idx in range(len(self.to_rgbs)):
            if packed and self.stage_is_packable(idx):
                out, skip = self.packed_stage(
                    idx, out, skip, latent[:, i], latent[:, i + 1],
                    latent[:, i + 2], noise_a=noise[1 + 2 * idx],
                    noise_b=noise[2 + 2 * idx],
                    unpack_out=(idx < len(self.to_rgbs) - 1))
            else:
                out = self.convs[2 * idx](out, latent[:, i],
                                          noise=noise[1 + 2 * idx])
                out = self.convs[2 * idx + 1](out, latent[:, i + 1],
                                              noise=noise[2 + 2 * idx])
                skip = self.to_rgbs[idx](out, latent[:, i + 2], skip)
            # spatial-partitioning anchor (no-op outside parallel.spatial
            # context): pins high-res stages H-sharded so GSPMD splits the
            # tail convs and inserts halo exchanges
            out, skip = sp_constrain(out), sp_constrain(skip)
            i += 2
        return skip


def feature_modulation(gen_feats, conditions, clss=None, mod_type: str = "SFT"):
    """Non-NOISE condition injection (reference model.py:588-609, shared by
    GCFSR_modules.py:638-660): SFT applies (scale, shift), ADD adds the shift
    term, FUSE gates the shift by sigmoid(scale). `conditions` is a
    (scale, shift) pair of NHWC tensors (either may be None for ADD)."""
    c = (jnp.asarray(1.0, gen_feats.dtype) if clss is None
         else clss.reshape(-1, 1, 1, 1).astype(gen_feats.dtype))
    if mod_type == "SFT":
        return (gen_feats * (1.0 + conditions[0].astype(gen_feats.dtype) * c)
                + conditions[1].astype(gen_feats.dtype) * c)
    if mod_type == "ADD":
        return gen_feats + conditions[1].astype(gen_feats.dtype)
    if mod_type == "FUSE":
        gate = jax.nn.sigmoid(conditions[0].astype(gen_feats.dtype)) * c
        return gen_feats + conditions[1].astype(gen_feats.dtype) * gate
    raise NotImplementedError(f"unknown mod_type {mod_type}")


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
