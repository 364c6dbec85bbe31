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
        self.enc = Encoder4Editing(num_layers=50, mode="ir_se",
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
    def _cond_layers(self, mod_size: int):
        """Generator layer indices receiving SAMM injection for the current
        progressive ModSize (arch L214-222, L293): 32px->layer5 ... 256px->11."""
        if not self.enable_modulation or mod_size <= 0:
            return []
        max_size = int(math.floor(math.log2(mod_size)))
        cond_len = min(max(1 + max_size - 5, 0), 4)
        return [(2 * (k + 2)) + 1 for k in range(cond_len)]

    def random_latents(self, z):
        """z -> W -> repeat to W+ (arch random_gen, L194-202)."""
        w = self.generator.style_mlp(z)
        return jnp.tile(w[:, None, :], (1, self.style_cnt, 1))

    def decode(self, lats, noise=None):
        """Plain decode (no SAMM)."""
        return self.generator(lats, noise=noise)

    # ---------------------------------------------------------------- forward
    def __call__(self, x, mod_size: int = 256, truncation: float = 1.0,
                 stage: int = PROGRESSIVE_INFERENCE, freeze_encoder: bool = True):
        """x: (B, H, W, 3) in [-1, 1]. Returns dict(image, lats, aligns, mask,
        gen_image). aligns maps SAMM index (1=32px .. 4=256px) to
        (B, h, w, 3) [dx, dy, alpha] plus key 1024 -> composited 3ch mask."""
        b = x.shape[0]
        x256 = resize_bilinear(x, (256, 256))
        lats, feats = self.enc(x256, stage=stage)
        if freeze_encoder:
            # reference runs the encoder under no_grad + eval (arch L256-258)
            lats = jax.lax.stop_gradient(lats)
            feats = [jax.lax.stop_gradient(f) for f in feats]

        lats = lats + self.avg_latent[None] + self.delta_latent
        if truncation < 1.0:
            lats = self.avg_latent[None] * (1.0 - truncation) + lats * truncation

        cond_layers = self._cond_layers(mod_size)
        if not cond_layers:
            image = self.generator(lats)
            return {"image": image, "lats": lats, "aligns": {}, "mask": None,
                    "gen_image": image}

        feats_c = [self.feats_conv[i](feats[i]) for i in range(4)]

        gen = self.generator
        out = gen.const_input(b)
        out = gen.conv1(out, lats[:, 0])
        skip = gen.to_rgb1(out, lats[:, 1])

        aligns = {}
        prev_align = None
        i = 1
        for idx in range(len(gen.to_rgbs)):
            conv_a = gen.convs[2 * idx]
            conv_b = gen.convs[2 * idx + 1]
            if i in cond_layers:
                ind = cond_layers.index(i) + 1           # 1..4, 1 = 32px
                out_c = conv_a.conv(out, lats[:, i])     # modulated upsample
                feat = feats_c[4 - ind]                  # feats[-ind]
                mod = self.modulation[4 - ind]           # modulation[-ind]
                aligned_feat, align = mod(feat, lats[:, i], out_c,
                                          aligned_coarse=prev_align)
                out = conv_a.noise(aligned_feat)         # aligned + w*n
                out = conv_a.activate(out)
                aligns[ind] = align
                prev_align = align
            else:
                out = conv_a(out, lats[:, i])
            out = conv_b(out, lats[:, i + 1])
            skip = gen.to_rgbs[idx](out, lats[:, i + 2], skip)
            i += 2

        gen_image = skip
        image = gen_image
        mask = None
        if self.blend_with_gen:
            mask = self.blending_mask(aligns)
            aligns[self.out_size] = jnp.tile(mask, (1, 1, 1, 3))
            for _ in range(self.blend_cnt):
                image = mask * jax.lax.stop_gradient(x) + image * (1.0 - mask)

        return {"image": image, "lats": lats, "aligns": aligns, "mask": mask,
                "gen_image": gen_image}

    def blending_mask(self, aligns):
        """Composite per-scale alphas to the full-res OOD mask
        (arch L315-339): upsample each alpha to out_size (bilinear, half-pixel)
        and fold coarse-to-fine with a' * a + a * (1 - a)."""
        size = (self.out_size, self.out_size)
        alpha = None
        for k in sorted(k for k in aligns if k <= 4):
            a_k = resize_bilinear(aligns[k][..., 2:3], size)
            if alpha is None:
                alpha = a_k
            else:
                alpha = (a_k * alpha) + (alpha * (1.0 - alpha))
        return jnp.clip(alpha, 0.0, 1.0)
