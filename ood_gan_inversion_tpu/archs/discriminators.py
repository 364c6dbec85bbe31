"""Discriminator archs (reference src/archs/Discriminator_arch.py:22-47)."""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..nn.stylegan2 import Discriminator
from ..nn.layers import EqualLinear


@ARCH_REGISTRY.register(name="StyleGAN2Discriminator_mod")
class StyleGAN2DiscriminatorMod(nn.Module):
    """Image discriminator returning (score, features)."""
    out_size: int = 1024
    channel_multiplier: int = 2
    resample_kernel: tuple = (1, 3, 3, 1)
    stddev_group: int = 4
    narrow: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Discriminator(self.out_size, self.channel_multiplier,
                             self.resample_kernel, self.stddev_group,
                             narrow=self.narrow, dtype=self.dtype,
                             name="d")(x)


@ARCH_REGISTRY.register(name="LatentDiscrinimator")  # sic — reference name
class LatentDiscriminator(nn.Module):
    """MLP over W+ (B, chn=18, dim=512): per-dim projection chn->hidden_chn,
    flatten, n_mlp fused-lrelu layers, scalar score. Returns (score, None)."""
    chn: int = 18
    dim: int = 512
    n_mlp: int = 8
    hidden_chn: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, c, n = x.shape                                   # (B, 18, 512)
        h = x.transpose(0, 2, 1).reshape(-1, c)             # (B*512, 18)
        h = EqualLinear(self.hidden_chn, activation="fused_lrelu",
                        dtype=self.dtype, name="first_linear")(h)
        h = h.reshape(b, n, self.hidden_chn).transpose(0, 2, 1).reshape(b, -1)
        h = EqualLinear(self.dim, activation="fused_lrelu", dtype=self.dtype,
                        name="layer_0")(h)
        for i in range(self.n_mlp):
            h = EqualLinear(self.dim, activation="fused_lrelu",
                            dtype=self.dtype, name=f"layer_{i + 1}")(h)
        score = EqualLinear(1, dtype=self.dtype, name="final_linear")(h)
        return score, None
