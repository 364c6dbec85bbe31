"""IR / IR-SE ResNet blocks and the ArcFace backbone (flax, NHWC).

Reference: src/ops/e4e/encoders/helpers.py:24-57 (block specs), 403-502
(bottlenecks), src/ops/face_id/model_irse.py:10-49 (ID backbone). BatchNorm
is eval-mode only — every IR-SE trunk in the system is a frozen pretrained
subnet (see nn/layers.py docstring).
"""

from collections import namedtuple
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (Conv2dTorch, PReLU, SEModule, BatchNorm2dEval,
                     InstanceNorm2d, norm_layer)

Bottleneck = namedtuple("Bottleneck", ["in_channel", "depth", "stride"])


def get_block(in_channel, depth, num_units, stride=2):
    return ([Bottleneck(in_channel, depth, stride)] +
            [Bottleneck(depth, depth, 1) for _ in range(num_units - 1)])


def get_blocks(num_layers):
    if num_layers == 50:
        return [get_block(64, 64, 3), get_block(64, 128, 4),
                get_block(128, 256, 14), get_block(256, 512, 3)]
    if num_layers == 100:
        return [get_block(64, 64, 3), get_block(64, 128, 13),
                get_block(128, 256, 30), get_block(256, 512, 3)]
    if num_layers == 152:
        return [get_block(64, 64, 3), get_block(64, 128, 8),
                get_block(128, 256, 36), get_block(256, 512, 3)]
    if num_layers == 4:
        # minimal smoke/dryrun trunk: one bottleneck per stage, same
        # stage channels/strides (= same tap shapes) as the real nets
        return [get_block(64, 64, 1), get_block(64, 128, 1),
                get_block(128, 256, 1), get_block(256, 512, 1)]
    raise ValueError(f"num_layers must be 4/50/100/152, got {num_layers}")


def trunk_taps(num_layers):
    """Indices of the last unit of each stage — the E4E/pSp feature taps
    (psp_encoders.py:178-196 hardcodes (2, 6, 20, 23) for ir-50; this is
    that rule generalized to any depth)."""
    idx, taps = -1, []
    for block in get_blocks(num_layers):
        idx += len(block)
        taps.append(idx)
    return tuple(taps)


class _Norm(nn.Module):
    """BN(depth, bn=...) switch as a module (helpers.py:93-99)."""
    channels: int
    kind: Any = True

    @nn.compact
    def __call__(self, x):
        if self.kind == "InstanceNorm":
            return InstanceNorm2d(self.channels, affine=True, name="norm")(x)
        if self.kind == "BatchNorm" or self.kind is True:
            return BatchNorm2dEval(self.channels, name="norm")(x)
        return x


class BottleneckIR(nn.Module):
    """helpers.py:424-447. shortcut: maxpool(1,stride) or 1x1 conv + norm;
    res: norm -> 3x3 -> PReLU -> 3x3(stride) -> norm."""
    in_ch: int
    depth: int
    stride: int = 1
    bn: Any = True
    use_bias: bool = False
    se: bool = False

    @nn.compact
    def __call__(self, x):
        if self.in_ch == self.depth:
            shortcut = x[:, ::self.stride, ::self.stride, :]
        else:
            shortcut = Conv2dTorch(self.depth, 1, self.stride, 0,
                                   use_bias=self.use_bias, name="shortcut_conv")(x)
            shortcut = _Norm(self.depth, self.bn, name="shortcut_norm")(shortcut)
        res = _Norm(self.in_ch, self.bn, name="norm1")(x)
        res = Conv2dTorch(self.depth, 3, 1, 1, use_bias=self.use_bias,
                          name="conv1")(res)
        res = PReLU(self.depth, name="prelu")(res)
        res = Conv2dTorch(self.depth, 3, self.stride, 1, use_bias=self.use_bias,
                          name="conv2")(res)
        res = _Norm(self.depth, self.bn, name="norm2")(res)
        if self.se:
            res = SEModule(16, name="se")(res)
        return res + shortcut


class IRSETrunk(nn.Module):
    """input_layer + body of the IR(-SE) nets, with optional feature taps.

    Taps (for E4E, psp_encoders.py:178-196): input-layer output plus body
    modules 2 / 6 / 20 / 23 for ir-50.
    """
    num_layers: int = 50
    mode: str = "ir_se"
    bn: Any = True
    input_ch: int = 3

    @nn.compact
    def __call__(self, x, taps: Sequence[int] = (2, 6, 20, 23)):
        blocks = get_blocks(self.num_layers)
        y = Conv2dTorch(64, 3, 1, 1, use_bias=False, name="input_conv")(x)
        y = _Norm(64, self.bn, name="input_norm")(y)
        y = PReLU(64, name="input_prelu")(y)
        feats = [y]
        idx = 0
        tapped = {}
        for bi, block in enumerate(blocks):
            for unit in block:
                y = BottleneckIR(unit.in_channel, unit.depth, unit.stride,
                                 bn=self.bn, se=(self.mode == "ir_se"),
                                 name=f"body_{idx}")(y)
                if idx in taps:
                    tapped[idx] = y
                idx += 1
        return y, feats + [tapped[i] for i in sorted(tapped)]


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class ArcFaceBackbone(nn.Module):
    """IR-SE-50 ID embedding net (face_id/model_irse.py:10-49); 112x112 input,
    l2-normalized 512-d output. Dropout is eval-mode (identity)."""
    num_layers: int = 50
    mode: str = "ir_se"
    input_size: int = 112
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        y, _ = IRSETrunk(self.num_layers, self.mode, bn=True, name="trunk")(
            x, taps=())
        y = BatchNorm2dEval(512, name="out_norm")(y)
        # flatten in NCHW order so converted torch Linear weights line up
        b = y.shape[0]
        y = jnp.transpose(y, (0, 3, 1, 2)).reshape(b, -1)
        w = self.param("linear_weight", nn.initializers.normal(0.01),
                       (y.shape[-1], 512))
        bb = self.param("linear_bias", nn.initializers.zeros, (512,))
        y = y @ w + bb
        y = BatchNorm2dEval(512, name="out_norm1d", eps=1e-5)(y)
        return l2_normalize(y, axis=1)
