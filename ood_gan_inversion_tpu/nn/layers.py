"""Equalized-lr / normalization / residual building blocks (flax linen, NHWC).

These re-found the primitive set of the reference's StyleGAN + encoder stacks
(src/ops/StyleGAN/model.py:91-175, src/ops/e4e/encoders/helpers.py:60-522) as
pure functional flax modules. Parameter layouts are chosen for the TPU (HWIO
kernels, channels-last activations); the torch->jax weight converter handles
the transposes.

BatchNorm note: on every training path of the reference the BatchNorm-bearing
subnets (E4E/ReStyle/FeatureStyle encoders, ArcFace backbones) are frozen and
in eval() mode, so BatchNorm here is an inference-only affine transform with
its running statistics stored as ordinary (frozen) parameters — no mutable
state, no batch-stat collection, jit-friendly.
"""

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from ..ops.modulated import equal_linear, equal_conv2d
from ..ops.upfirdn2d import make_kernel, blur as fir_blur, upsample2x, downsample2x


def torch_conv_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default weight init (kaiming uniform, a=sqrt(5)):
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = kh*kw*cin. HWIO shape."""
    kh, kw, cin, _ = shape
    bound = 1.0 / math.sqrt(kh * kw * cin)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_normal_init(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_normal_ for HWIO conv / (in,out) linear weights."""
    if len(shape) == 4:
        kh, kw, cin, cout = shape
        fan_in, fan_out = kh * kw * cin, kh * kw * cout
    else:
        fan_in, fan_out = shape[0], shape[1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape, dtype) * std


class EqualLinear(nn.Module):
    """Reference `EqualLinear` (model.py:129-158). weight stored (in, out),
    init N(0, 1/lr_mul); runtime scale lr_mul/sqrt(in)."""
    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight",
                       lambda k, s: jax.random.normal(k, s) / self.lr_mul,
                       (in_dim, self.out_dim))
        b = (self.param("bias", nn.initializers.constant(self.bias_init),
                        (self.out_dim,)) if self.use_bias else None)
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        y = x @ (w * scale).astype(x.dtype)
        if self.activation == "fused_lrelu":
            y = fused_leaky_relu(y, None if b is None else b * self.lr_mul)
        elif b is not None:
            y = y + (b * self.lr_mul).astype(y.dtype)
        return y


class EqualConv2d(nn.Module):
    """Reference `EqualConv2d` (model.py:91-120)."""
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.kernel_size, self.kernel_size, cin, self.out_ch))
        b = (self.param("bias", nn.initializers.zeros, (self.out_ch,))
             if self.use_bias else None)
        return equal_conv2d(x, w.astype(x.dtype),
                            None if b is None else b.astype(x.dtype),
                            stride=self.stride, padding=self.padding)


class Conv2dTorch(nn.Module):
    """Plain conv with torch nn.Conv2d default init (used by feats_conv,
    FPN lateral layers, GradualStyleBlock, IR bottlenecks)."""
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("weight", torch_conv_init,
                       (self.kernel_size, self.kernel_size, cin, self.out_ch))
        b = (self.param("bias", torch_bias_init(self.kernel_size ** 2 * cin),
                        (self.out_ch,)) if self.use_bias else None)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if b is not None:
            y = y + b.astype(y.dtype).reshape(1, 1, 1, -1)
        return y


class Conv2dTorchS(nn.Module):
    """Setup-style Conv2dTorch (explicit in_ch) exposing .weight/.bias so
    grouped evaluators (nn/encoders/e4e.py style-chain batching) can read
    params without invoking the module. Identical param names/init/math to
    Conv2dTorch."""
    in_ch: int
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    def setup(self):
        self.weight = self.param(
            "weight", torch_conv_init,
            (self.kernel_size, self.kernel_size, self.in_ch, self.out_ch))
        if self.use_bias:
            self.bias = self.param(
                "bias", torch_bias_init(self.kernel_size ** 2 * self.in_ch),
                (self.out_ch,))

    def __call__(self, x):
        y = jax.lax.conv_general_dilated(
            x, self.weight.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.bias.astype(y.dtype).reshape(1, 1, 1, -1)
        return y


class EqualLinearS(nn.Module):
    """Setup-style EqualLinear (explicit in_dim) exposing .weight/.bias for
    grouped evaluation. Identical param names/init/math to EqualLinear
    (plain-bias path; no fused_lrelu activation here)."""
    in_dim: int
    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0

    def setup(self):
        self.weight = self.param(
            "weight", lambda k, s: jax.random.normal(k, s) / self.lr_mul,
            (self.in_dim, self.out_dim))
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.constant(self.bias_init),
                (self.out_dim,))

    def __call__(self, x):
        scale = (1.0 / math.sqrt(self.in_dim)) * self.lr_mul
        y = x @ (self.weight * scale).astype(x.dtype)
        if self.use_bias:
            y = y + (self.bias * self.lr_mul).astype(y.dtype)
        return y


class FusedLeakyReLU(nn.Module):
    """Bias + lrelu(0.2) * sqrt(2) with learned per-channel bias
    (reference src/ops/op/fused_act.py:79-96). setup-style so the packed
    polyphase decode path can read `.bias` without invoking the module."""
    channels: int
    negative_slope: float = 0.2

    def setup(self):
        self.bias = self.param("bias", nn.initializers.zeros, (self.channels,))

    def __call__(self, x):
        return fused_leaky_relu(x, self.bias, self.negative_slope)


class PReLU(nn.Module):
    """torch nn.PReLU(channels), init 0.25."""
    channels: int

    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(0.25), (self.channels,))
        a = a.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class BatchNorm2dEval(nn.Module):
    """Inference-mode BatchNorm: affine transform by stored running stats.
    See module docstring for why this is sufficient (frozen subnets only)."""
    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = self.param("mean", nn.initializers.zeros, (self.channels,))
        var = self.param("var", nn.initializers.ones, (self.channels,))
        inv = (jax.lax.rsqrt(var.astype(jnp.float32) + self.eps) *
               scale.astype(jnp.float32))
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


class BatchNorm1dEval(BatchNorm2dEval):
    pass


class InstanceNorm2d(nn.Module):
    """torch nn.InstanceNorm2d (per-sample per-channel over H,W; biased var).
    affine=False by default, matching AlignNet.norm (SAMM/helpers.py:88)."""
    channels: int
    affine: bool = False
    eps: float = 1e-5

    def setup(self):
        # setup-style (not compact) so the fused SAMM path can read
        # .scale/.bias without invoking the module (same names/tree)
        if self.affine:
            self.scale = self.param("scale", nn.initializers.ones,
                                    (self.channels,))
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.channels,))

    def __call__(self, x):
        # single-pass moments: E[x] and E[x^2] reduce over the SAME input in
        # one fused pass (jnp.var would first materialize x - mean, costing a
        # second dependent full pass); biased var = E[x^2] - E[x]^2 matches
        # torch InstanceNorm2d. fp32 accumulation for bf16 inputs.
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        mean2 = jnp.mean(x32 * x32, axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        rstd = jax.lax.rsqrt(var + self.eps)
        if self.affine:
            # fold affine into the normalize pass: one multiply-add total
            k = rstd * self.scale.astype(jnp.float32)
            b = self.bias.astype(jnp.float32) - mean * k
            return (x32 * k + b).astype(x.dtype)
        return ((x32 - mean) * rstd).astype(x.dtype)


def norm_layer(kind, channels: int):
    """The reference's `BN(depth, bn=...)` switch (e4e/encoders/helpers.py:93-99)."""
    if kind == "InstanceNorm":
        return InstanceNorm2d(channels, affine=True)
    if kind == "BatchNorm" or kind is True:
        return BatchNorm2dEval(channels)
    return lambda x: x


class ConvLayer(nn.Module):
    """Reference `ConvLayer` (model.py:612-658): optional FIR-blur downsample,
    EqualConv2d, fused or scaled lrelu."""
    out_ch: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            k = make_kernel(self.blur_kernel)
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            x = fir_blur(x, k, pad=((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(self.out_ch, self.kernel_size, stride, padding,
                        use_bias=self.use_bias and not self.activate,
                        dtype=self.dtype, name="conv")(x)
        if self.activate:
            if self.use_bias:
                x = FusedLeakyReLU(self.out_ch, name="act")(x)
            else:
                x = scaled_leaky_relu(x)
        return x


class ResBlock(nn.Module):
    """Reference `ResBlock` (model.py:661-679)."""
    out_ch: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        out = ConvLayer(cin, 3, dtype=self.dtype, name="conv1")(x)
        out = ConvLayer(self.out_ch, 3, downsample=True,
                        blur_kernel=self.blur_kernel, dtype=self.dtype,
                        name="conv2")(out)
        skip = ConvLayer(self.out_ch, 1, downsample=True,
                         blur_kernel=self.blur_kernel, use_bias=False,
                         activate=False, dtype=self.dtype, name="skip")(x)
        return (out + skip) / math.sqrt(2)


class SEModule(nn.Module):
    """Squeeze-excite (e4e/encoders/helpers.py:60-77): 1x1 convs, no bias."""
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv2dTorch(c // self.reduction, 1, use_bias=False,
                        dtype=self.dtype, name="fc1")(s)
        s = jax.nn.relu(s)
        s = Conv2dTorch(c, 1, use_bias=False, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)
