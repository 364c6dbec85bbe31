"""ReStyle progressive backbone encoder (flax, NHWC).

Reference: src/ops/restyle/restyle_e4e_encoder.py:35-110
(ProgressiveBackboneEncoder): IR-SE-50 trunk over a 6-channel input
[x || previous-output], ALL style vectors from the final 16x16 map via
GradualStyleBlock(512, 512, 16); feature taps at body 2/6/20/23 like E4E."""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..irse import IRSETrunk, trunk_taps
from .e4e import (GradualStyleBlock, PROGRESSIVE_INFERENCE, _E4E_GROUPED,
                  styles_grouped)


class ProgressiveBackboneEncoder(nn.Module):
    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 18
    input_nc: int = 6
    bn: Any = True

    def setup(self):
        self.trunk = IRSETrunk(self.num_layers, self.mode, bn=self.bn,
                               input_ch=self.input_nc)
        self.styles = [GradualStyleBlock(512, 16, name=f"style_{i}")
                       for i in range(self.n_styles)]
        self.channels = [64, 64, 128, 256, 512]

    def __call__(self, x, stage: int = PROGRESSIVE_INFERENCE):
        final, feats = self.trunk(x, taps=trunk_taps(self.num_layers))
        if _E4E_GROUPED and min(stage + 1, self.n_styles) == self.n_styles:
            # all n_styles heads share the final 16px map -> one group
            # (nn/encoders/e4e.py:styles_grouped; exact math)
            outs = styles_grouped(self.styles, final)
            w0 = outs[0]
            w = w0[:, None, :] + jnp.stack(
                [jnp.zeros_like(w0)] + outs[1:], axis=1)
            return w, feats
        w0 = self.styles[0](final)
        deltas = [jnp.zeros_like(w0)]
        for i in range(1, min(stage + 1, self.n_styles)):
            deltas.append(self.styles[i](final))
        for _ in range(len(deltas), self.n_styles):
            deltas.append(jnp.zeros_like(w0))
        w = w0[:, None, :] + jnp.stack(deltas, axis=1)
        return w, feats
