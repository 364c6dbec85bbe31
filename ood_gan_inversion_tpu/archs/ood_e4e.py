"""OOD face-GAN inversion arch, E4E encoder family.

Reference: src/archs/OOD_faceGAN_e4e_arch.py:28-347. The full pipeline —
encode -> W+ latent math -> SAMM-conditioned StyleGAN2 decode -> mask
composite -> OOD blend — is ONE pure jitted function here. The reference's
NoiseInjection-callback protocol with module-held `self.aligns`
(arch L224-242, model.py:283-292) becomes an explicit decode loop over the
generator's submodules with the aligns pyramid threaded as values.

Callback algebra: the reference injects condition=(aligned-image+n*w)/w into
image + w*condition == aligned + w*n; we compute that directly.

Progressive ModSize is a static argument: each of the <=4 curriculum stages
is its own compiled program (cheap; shapes are static inside each stage).
"""

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..nn.stylegan2 import Generator, STYLEGAN2_CHANNELS
from ..nn.encoders.e4e import Encoder4Editing, PROGRESSIVE_INFERENCE
from ..nn.samm import StyledScaleNShiftBlock
from ..nn.layers import Conv2dTorch
from ..ops.resize import resize_bilinear
from .common import cond_layers_for, conditioned_decode, blend_and_pack


@ARCH_REGISTRY.register(name="ood_faceGAN_e4e")
class OODFaceGANE4E(nn.Module):
    """Constructor keys mirror the reference YAML `network_g` schema
    (options/train/E4E_Face.yml:50-71); checkpoint-path keys are consumed by
    the model layer (weights enter through the converter), not here."""
    out_size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    encoder: str = "E4E"
    # trunk depth of the IR-SE encoder; 50 is the reference's net, 4 is a
    # shape-identical minimal trunk for smoke/dryrun configs (nn/irse.py)
    encoder_num_layers: int = 50
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
        self.enc = Encoder4Editing(num_layers=self.encoder_num_layers,
                                   mode="ir_se",
                                   stylegan_size=self.out_size, bn=True,
                                   name="encoder")
        if self.enable_modulation:
            # 1x1 adapters encoder-channels -> generator-channels at
            # 256/128/64/32 px (arch L70-75)
            feat_sizes = [256, 128, 64, 32]
            enc_channels = [64, 64, 128, 256]
            self.feats_conv = [
                Conv2dTorch(channels[feat_sizes[i]], 1, 1, 0,
                            name=f"feats_conv_{i}") for i in range(4)]
            # SAMM blocks, coarse->fine order [256,128,64,32] (arch L108-116)
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
                                     (1, self.style_dim))
        if self.optim_delta_latent:
            self.delta_latent = self.param(
                "delta_latent",
                lambda k, s: jax.random.normal(k, s) * 0.1,
                (1, self.style_cnt, self.style_dim))
        else:
            self.delta_latent = self.param(
                "delta_latent", nn.initializers.zeros,
                (1, self.style_cnt, self.style_dim))

    # ---------------------------------------------------------------- utils
    def random_latents(self, z):
        """z -> W -> repeat to W+ (arch random_gen, L194-202)."""
        w = self.generator.style_mlp(z)
        return jnp.tile(w[:, None, :], (1, self.style_cnt, 1))

    def decode(self, lats, noise=None):
        """Plain decode (no SAMM)."""
        return self.generator(lats, noise=noise)

    # ---------------------------------------------------------------- forward
    def encode(self, x, truncation: float = 1.0,
               stage: int = PROGRESSIVE_INFERENCE, freeze_encoder: bool = True):
        """Image -> (W+ latents, adapted SAMM features). Split out of the
        forward so the path-length regularizer can differentiate the decode
        w.r.t. the latents (reference g_path_regularize,
        BasicSR losses.py:408-418)."""
        x = x.astype(self.dtype)
        x256 = resize_bilinear(x, (256, 256))
        lats, feats = self.enc(x256, stage=stage)
        if freeze_encoder:
            # reference runs the encoder under no_grad + eval (arch L256-258)
            lats = jax.lax.stop_gradient(lats)
            feats = [jax.lax.stop_gradient(f) for f in feats]

        lats = (lats + self.avg_latent[None].astype(lats.dtype)
                + self.delta_latent.astype(lats.dtype))
        if truncation < 1.0:
            lats = (self.avg_latent[None].astype(lats.dtype) * (1.0 - truncation)
                    + lats * truncation)
        feats_c = ([self.feats_conv[i](feats[i]) for i in range(4)]
                   if self.enable_modulation else None)
        return lats, feats_c

    def decode_samm(self, lats, feats_c, x, mod_size: int = 256, noise=None,
                    train: bool = False):
        """(W+, adapted feats) -> blended output dict. train: enable the
        per-stage remat (training only; see conditioned_decode)."""
        x = x.astype(self.dtype)
        if not self.enable_modulation or not cond_layers_for(mod_size):
            image = self.generator(lats, noise=noise)
            return {"image": image, "lats": lats, "aligns": {}, "mask": None,
                    "gen_image": image}
        gen_image, aligns = conditioned_decode(self, lats, feats_c, mod_size,
                                               noise=noise, train=train)
        return blend_and_pack(self, x, gen_image, lats, aligns)

    def __call__(self, x, mod_size: int = 256, truncation: float = 1.0,
                 stage: int = PROGRESSIVE_INFERENCE, freeze_encoder: bool = True,
                 noise=None, train: bool = False):
        """x: (B, H, W, 3) in [-1, 1]. Returns dict(image, lats, aligns, mask,
        gen_image). aligns maps SAMM index (1=32px .. 4=256px) to
        (B, h, w, 3) [dx, dy, alpha] plus key 1024 -> composited 3ch mask."""
        lats, feats_c = self.encode(x, truncation, stage, freeze_encoder)
        return self.decode_samm(lats, feats_c, x, mod_size, noise=noise,
                                train=train)
