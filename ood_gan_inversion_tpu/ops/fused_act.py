"""Bias + LeakyReLU + sqrt(2) gain, as a plain jnp expression.

Replaces the reference CUDA `fused_bias_act` kernel
(src/ops/op/fused_bias_act_kernel.cu:36-47) and matches its CPU fallback
(src/ops/op/fused_act.py:92-96):

    out = scale * leaky_relu(x + bias, negative_slope)

On TPU there is nothing to hand-fuse: XLA folds this into the producing
matmul/conv epilogue. Standard autodiff yields the identical gradient as the
reference's grad-through-output trick, so no custom_vjp is needed.
"""

import math

import jax.numpy as jnp


SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray | None = None,
                     negative_slope: float = 0.2, scale: float = SQRT2) -> jnp.ndarray:
    """bias broadcast over the channel (last) axis of an NHWC / (..., C) tensor."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    return scale * jnp.where(x >= 0, x, negative_slope * x)


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """Reference `ScaledLeakyReLU` (src/ops/StyleGAN/model.py:166-175)."""
    return SQRT2 * jnp.where(x >= 0, x, negative_slope * x)
