"""FeatureStyle encoder: ArcFace iresnet50 trunk + 18 linear style heads +
content tensor (flax, NHWC).

Reference: src/ops/FeatureStyle/feature_style_encoder.py:12-74 (fs_encoder_v2)
and arcface/iresnet.py:28-130 (IBasicBlock/IResNet). All BatchNorm is
eval-mode (the encoder is a frozen pretrained subnet on every path)."""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import Conv2dTorch, PReLU, BatchNorm2dEval
from ...ops.resize import adaptive_avg_pool


class IBasicBlock(nn.Module):
    """iresnet.py:28-57: bn1 -> conv3x3 -> bn2 -> prelu -> conv3x3(stride)
    -> bn3 (+ conv1x1/bn downsample)."""
    in_ch: int
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out = BatchNorm2dEval(self.in_ch, name="bn1")(x)
        out = Conv2dTorch(self.planes, 3, 1, 1, use_bias=False, name="conv1")(out)
        out = BatchNorm2dEval(self.planes, name="bn2")(out)
        out = PReLU(self.planes, name="prelu")(out)
        out = Conv2dTorch(self.planes, 3, self.stride, 1, use_bias=False,
                          name="conv2")(out)
        out = BatchNorm2dEval(self.planes, name="bn3")(out)
        if self.stride != 1 or self.in_ch != self.planes:
            identity = Conv2dTorch(self.planes, 1, self.stride, 0,
                                   use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm2dEval(self.planes, name="downsample_bn")(identity)
        else:
            identity = x
        return out + identity


IRESNET50_LAYERS = (3, 4, 14, 3)


class _IResLayer(nn.Module):
    in_ch: int
    planes: int
    blocks: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        x = IBasicBlock(self.in_ch, self.planes, self.stride, name="block_0")(x)
        for i in range(1, self.blocks):
            x = IBasicBlock(self.planes, self.planes, 1, name=f"block_{i}")(x)
        return x


class FSEncoderV2(nn.Module):
    """fs_encoder_v2 with stride=(2,2) content layer (the arch's setting,
    OOD_faceGAN_featureStyle_arch.py:73-74). Returns (W+ (B, n_styles, 512),
    content (B, 16, 16, 512), samm_feats [256/128/64/32 px])."""
    n_styles: int = 18
    content_stride: int = 2

    @nn.compact
    def __call__(self, x):
        samm_feats = []
        y = Conv2dTorch(64, 3, 1, 1, use_bias=False, name="input_conv")(x)
        y = BatchNorm2dEval(64, name="input_bn")(y)
        y = PReLU(64, name="input_prelu")(y)
        samm_feats.append(y)

        feats = []
        y = _IResLayer(64, 64, IRESNET50_LAYERS[0], name="layer1")(y)
        samm_feats.append(y)
        feats.append(adaptive_avg_pool(y, (3, 3)))
        y = _IResLayer(64, 128, IRESNET50_LAYERS[1], name="layer2")(y)
        samm_feats.append(y)
        feats.append(adaptive_avg_pool(y, (3, 3)))
        y = _IResLayer(128, 256, IRESNET50_LAYERS[2], name="layer3")(y)
        samm_feats.append(y)

        # content tensor (feature_style_encoder.py:34-41)
        c = BatchNorm2dEval(256, name="content_bn0")(y)
        c = Conv2dTorch(512, 3, 1, 1, use_bias=False, name="content_conv0")(c)
        c = BatchNorm2dEval(512, name="content_bn1")(c)
        c = PReLU(512, name="content_prelu")(c)
        c = Conv2dTorch(512, 3, self.content_stride, 1, use_bias=False,
                        name="content_conv1")(c)
        content = BatchNorm2dEval(512, name="content_bn2")(c)

        feats.append(adaptive_avg_pool(y, (3, 3)))
        y = _IResLayer(256, 512, IRESNET50_LAYERS[3], name="layer4")(y)
        feats.append(adaptive_avg_pool(y, (3, 3)))

        # concat pooled block features: (B, 3, 3, 960) -> NCHW flatten order
        h = jnp.concatenate(feats, axis=-1)
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        lats = []
        for i in range(self.n_styles):
            w = self.param(f"style_{i}_weight", nn.initializers.normal(0.01),
                           (h.shape[-1], 512))
            b = self.param(f"style_{i}_bias", nn.initializers.zeros, (512,))
            lats.append(h @ w + b)
        return jnp.stack(lats, axis=1), content, samm_feats
