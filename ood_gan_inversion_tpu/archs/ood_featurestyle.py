"""OOD face-GAN inversion arch, FeatureStyle encoder family.

Reference: src/archs/OOD_faceGAN_featureStyle_arch.py:28-334. Differences from
the E4E arch: the fs encoder additionally emits a content tensor injected
into the generator at layer 5 with feature_scale=1.0 (consumed via
features_in, src/ops/StyleGAN/model.py:541-546), and avg_latent is per-layer
(style_cnt, style_dim)."""

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..nn.stylegan2 import Generator, STYLEGAN2_CHANNELS
from ..nn.encoders.feature_style import FSEncoderV2
from ..nn.samm import StyledScaleNShiftBlock
from ..nn.layers import Conv2dTorch
from ..ops.resize import adaptive_avg_pool
from .common import cond_layers_for, conditioned_decode, blend_and_pack


@ARCH_REGISTRY.register(name="ood_faceGAN_FeatureStyle")
class OODFaceGANFeatureStyle(nn.Module):
    out_size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    encoder: str = "FeatureStyle"
    enable_modulation: bool = True
    modulation_type: str = "NOISE"
    warp_scale: float = 0.02
    cycle_align: int = 1
    mod_btn: Optional[str] = None
    diff_fAndg: bool = True
    blend_with_gen: bool = True
    blend_cnt: int = 1
    skip_SA: bool = False
    optim_delta_latent: bool = False
    feature_scale: float = 1.0
    # The reference FS arch computes the content tensor but its forward
    # NEVER passes it to generate (OOD_faceGAN_featureStyle_arch.py:286
    # builds `contents`, :299 calls generate(lats, feats, x) without it) —
    # the injection wiring is dead code there, so trained FS checkpoints saw
    # no content injection. Default False for golden/real-weight parity;
    # True enables the (clearly intended) injection as a TPU-side extension.
    inject_content: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.style_cnt = int(math.log2(self.out_size)) * 2 - 2
        channels = STYLEGAN2_CHANNELS(self.channel_multiplier, self.narrow)
        self.enc = FSEncoderV2(n_styles=self.style_cnt, content_stride=2,
                               name="encoder")
        if self.enable_modulation:
            feat_sizes = [256, 128, 64, 32]
            self.feats_conv = [
                Conv2dTorch(channels[feat_sizes[i]], 1, 1, 0,
                            name=f"feats_conv_{i}") for i in range(4)]
            chn_mul = 2 if self.modulation_type == "SFT" else 1
            self.modulation = [
                StyledScaleNShiftBlock(
                    channels[2 ** i], channels[2 ** i] * chn_mul,
                    warp_scale=self.warp_scale, cycle_align=self.cycle_align,
                    btn=self.mod_btn, diff_f_and_g=self.diff_fAndg,
                    dtype=self.dtype, name=f"modulation_{8 - i}")
                for i in range(8, 4, -1)]
        self.generator = Generator(size=self.out_size, style_dim=self.style_dim,
                                   n_mlp=self.n_mlp,
                                   channel_multiplier=self.channel_multiplier,
                                   narrow=self.narrow,
                                   dtype=self.dtype)
        self.avg_latent = self.param("avg_latent", nn.initializers.zeros,
                                     (self.style_cnt, self.style_dim))
        init = ((lambda k, s: jax.random.normal(k, s) * 0.1)
                if self.optim_delta_latent else nn.initializers.zeros)
        self.delta_latent = self.param("delta_latent", init,
                                       (1, self.style_cnt, self.style_dim))

    def random_latents(self, z):
        w = self.generator.style_mlp(z)
        return jnp.tile(w[:, None, :], (1, self.style_cnt, 1))

    def encode(self, x, truncation: float = 1.0, stage: int = 18,
               freeze_encoder: bool = True):
        """Returns (lats, (feats_c, content)) — content rides along so the
        decode can inject it at generator layer 5."""
        x = x.astype(self.dtype)   # compute dtype follows the input from here
        x256 = adaptive_avg_pool(x, (256, 256))   # reference face_pool L81
        lats, content, feats = self.enc(x256)
        if freeze_encoder:
            lats = jax.lax.stop_gradient(lats)
            content = jax.lax.stop_gradient(content)
            feats = [jax.lax.stop_gradient(f) for f in feats]

        lats = (lats + self.avg_latent[None].astype(lats.dtype)
                + self.delta_latent.astype(lats.dtype))
        if truncation < 1.0:
            lats = (self.avg_latent[None].astype(lats.dtype) * (1.0 - truncation)
                    + lats * truncation)
        feats_c = ([self.feats_conv[i](feats[i]) for i in range(4)]
                   if self.enable_modulation else None)
        return lats, (feats_c, content)

    def decode_samm(self, lats, feats_and_content, x, mod_size: int = 256,
                    train: bool = False):
        feats_c, content = feats_and_content
        x = x.astype(self.dtype)
        # layer 5, scale 1.0 per reference L285-287 — gated, see inject_content
        features_in = {5: content} if self.inject_content else None
        if not self.enable_modulation or not cond_layers_for(mod_size):
            # plain decode still honors the content injection
            gen_image, _ = conditioned_decode(self, lats, [None] * 4, 0,
                                              features_in=features_in,
                                              feature_scale=self.feature_scale,
                                              train=train)
            return {"image": gen_image, "lats": lats, "aligns": {},
                    "mask": None, "gen_image": gen_image}
        gen_image, aligns = conditioned_decode(
            self, lats, feats_c, mod_size, features_in=features_in,
            feature_scale=self.feature_scale, train=train)
        return blend_and_pack(self, x, gen_image, lats, aligns)

    def __call__(self, x, mod_size: int = 256, truncation: float = 1.0,
                 stage: int = 18, freeze_encoder: bool = True,
                 train: bool = False):
        lats, fc = self.encode(x, truncation, stage, freeze_encoder)
        return self.decode_samm(lats, fc, x, mod_size, train=train)
