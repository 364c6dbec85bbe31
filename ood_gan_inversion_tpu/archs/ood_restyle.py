"""OOD face-GAN inversion arch, ReStyle encoder family.

Reference: src/archs/OOD_faceGAN_restyle_arch.py:30-372. Differences from the
E4E arch: (a) the encoder takes 6 channels [x || previous decode], iterated
`enc_cycle` times starting from the average image, all under stop_gradient
(reference runs the loop in no_grad, L304-325); (b) avg_latent is per-layer
(style_cnt, style_dim). The refinement loop is a static Python loop
(enc_cycle is a config constant), so the whole forward stays one program."""

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..nn.stylegan2 import Generator, STYLEGAN2_CHANNELS
from ..nn.encoders.restyle import ProgressiveBackboneEncoder
from ..nn.encoders.e4e import PROGRESSIVE_INFERENCE
from ..nn.samm import StyledScaleNShiftBlock
from ..nn.layers import Conv2dTorch
from ..ops.resize import adaptive_avg_pool
from .common import cond_layers_for, conditioned_decode, blend_and_pack


@ARCH_REGISTRY.register(name="ood_faceGAN_restyle")
class OODFaceGANReStyle(nn.Module):
    out_size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    encoder: str = "ReStyle"
    enc_cycle: int = 2
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
    dtype: Any = jnp.float32

    def setup(self):
        self.style_cnt = int(math.log2(self.out_size)) * 2 - 2
        channels = STYLEGAN2_CHANNELS(self.channel_multiplier, self.narrow)
        self.enc = ProgressiveBackboneEncoder(
            num_layers=50, mode="ir_se", n_styles=self.style_cnt,
            input_nc=6, name="encoder")
        if self.enable_modulation:
            feat_sizes = [256, 128, 64, 32]
            enc_channels = [64, 64, 128, 256]
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
        # per-layer average latent (reference restyle arch L66: (18, 512))
        self.avg_latent = self.param("avg_latent", nn.initializers.zeros,
                                     (self.style_cnt, self.style_dim))
        init = ((lambda k, s: jax.random.normal(k, s) * 0.1)
                if self.optim_delta_latent else nn.initializers.zeros)
        self.delta_latent = self.param("delta_latent", init,
                                       (1, self.style_cnt, self.style_dim))

    def random_latents(self, z):
        w = self.generator.style_mlp(z)
        return jnp.tile(w[:, None, :], (1, self.style_cnt, 1))

    def encode(self, x, truncation: float = 1.0,
               stage: int = PROGRESSIVE_INFERENCE, freeze_encoder: bool = True):
        b = x.shape[0]
        x = x.astype(self.dtype)   # compute dtype follows the input from here
        x256 = adaptive_avg_pool(x, (256, 256))   # reference face_pool L88

        # average image from avg_latent (L304-306)
        avg_img = self.generator(self.avg_latent[None].astype(x.dtype))
        avg_img = adaptive_avg_pool(avg_img, (256, 256))
        avg_img = jnp.tile(avg_img, (b, 1, 1, 1))

        # iterative encode-decode refinement (no_grad in the reference)
        lats, feats = self.enc(jnp.concatenate([x256, avg_img], axis=-1),
                               stage=stage)
        lats = lats + self.avg_latent[None].astype(lats.dtype)
        for _ in range(self.enc_cycle - 1):
            new_x = self.generator(jax.lax.stop_gradient(lats))
            new_x = adaptive_avg_pool(new_x, (256, 256))
            delta, feats = self.enc(
                jnp.concatenate([x256, new_x], axis=-1), stage=stage)
            lats = lats + delta
        if freeze_encoder:
            lats = jax.lax.stop_gradient(lats)
            feats = [jax.lax.stop_gradient(f) for f in feats]

        lats = lats + self.delta_latent.astype(lats.dtype)
        if truncation < 1.0:
            lats = (self.avg_latent[None].astype(lats.dtype) * (1.0 - truncation)
                    + lats * truncation)
        feats_c = ([self.feats_conv[i](feats[i]) for i in range(4)]
                   if self.enable_modulation else None)
        return lats, feats_c

    def decode_samm(self, lats, feats_c, x, mod_size: int = 256,
                    train: bool = False):
        x = x.astype(self.dtype)
        if not self.enable_modulation or not cond_layers_for(mod_size):
            image = self.generator(lats)
            return {"image": image, "lats": lats, "aligns": {}, "mask": None,
                    "gen_image": image}
        gen_image, aligns = conditioned_decode(self, lats, feats_c, mod_size,
                                               train=train)
        return blend_and_pack(self, x, gen_image, lats, aligns)

    def __call__(self, x, mod_size: int = 256, truncation: float = 1.0,
                 stage: int = PROGRESSIVE_INFERENCE, freeze_encoder: bool = True,
                 train: bool = False):
        lats, feats_c = self.encode(x, truncation, stage, freeze_encoder)
        return self.decode_samm(lats, feats_c, x, mod_size, train=train)
