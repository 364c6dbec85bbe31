"""ResNetArcFace — the grayscale ArcFace recognition net used by the
reference's (config-unused) ArcFaceLoss.

Reference: src/ops/face_id/arcface_arch.py:16-245 (IRBlock/BasicBlock/
SEBlock/ResNetArcFace, registered in ARCH_REGISTRY there; here it is a plain
flax module consumed by losses/id_loss.py:ArcFaceLoss). 1-channel 128x128
input, IRBlock [2, 2, 2, 2] trunk, 512-d embedding. All norms are eval-mode
(inference statistics), matching the frozen pretrained usage.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import BatchNorm2dEval, Conv2dTorch


class _ScalarPReLU(nn.Module):
    """torch nn.PReLU() default: ONE shared slope parameter."""

    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class _BatchNorm1dEval(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = self.param("mean", nn.initializers.zeros, (self.channels,))
        var = self.param("var", nn.initializers.ones, (self.channels,))
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return (x - mean) * inv.astype(x.dtype) + bias.astype(x.dtype)


class SEBlock(nn.Module):
    """arcface_arch.py:149-168 (PReLU excitation, unlike IR-SE's ReLU)."""
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        b, _, _, c = x.shape
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.channels // self.reduction, name="fc0")(y)
        y = _ScalarPReLU(name="prelu")(y)
        y = nn.Dense(self.channels, name="fc1")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class IRBlock(nn.Module):
    """arcface_arch.py:56-102: bn0 -> conv3x3 -> bn1 -> prelu ->
    conv3x3(stride) -> bn2 (-> SE) + downsample residual -> prelu."""
    in_ch: int
    planes: int
    stride: int = 1
    use_se: bool = True

    @nn.compact
    def __call__(self, x):
        res = x
        y = BatchNorm2dEval(self.in_ch, name="bn0")(x)
        y = Conv2dTorch(self.in_ch, 3, 1, 1, use_bias=False, name="conv1")(y)
        y = BatchNorm2dEval(self.in_ch, name="bn1")(y)
        y = _ScalarPReLU(name="prelu")(y)
        y = Conv2dTorch(self.planes, 3, self.stride, 1, use_bias=False,
                        name="conv2")(y)
        y = BatchNorm2dEval(self.planes, name="bn2")(y)
        if self.use_se:
            y = SEBlock(self.planes, name="se")(y)
        if self.stride != 1 or self.in_ch != self.planes:
            res = Conv2dTorch(self.planes, 1, self.stride, 0, use_bias=False,
                              name="down_conv")(x)
            res = BatchNorm2dEval(self.planes, name="down_bn")(res)
        return _ScalarPReLU(name="prelu_out")(y + res)


class ResNetArcFace(nn.Module):
    """arcface_arch.py:171-245. Input (B, 128, 128, 1) grayscale in [-1, 1]
    convention of the caller; returns (B, 512) embeddings (NOT normalized,
    matching the reference)."""
    layers: Sequence[int] = (2, 2, 2, 2)
    use_se: bool = False

    @nn.compact
    def __call__(self, x):
        y = Conv2dTorch(64, 3, 1, 1, use_bias=False, name="conv1")(x)
        y = BatchNorm2dEval(64, name="bn1")(y)
        y = _ScalarPReLU(name="prelu")(y)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        in_ch = 64
        for li, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                             self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(n):
                y = IRBlock(in_ch, planes, stride if bi == 0 else 1,
                            use_se=self.use_se, name=f"layer{li + 1}_{bi}")(y)
                in_ch = planes
        y = BatchNorm2dEval(512, name="bn4")(y)
        # dropout is eval-mode (identity); flatten matches torch NCHW order
        b = y.shape[0]
        y = jnp.transpose(y, (0, 3, 1, 2)).reshape(b, -1)
        y = nn.Dense(512, name="fc5")(y)
        return _BatchNorm1dEval(512, name="bn5")(y)
