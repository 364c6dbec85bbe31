"""AlexNet-LPIPS perceptual distance (flax, NHWC).

Reference: the `lpips` pip package wrapped at src/metrics/lpips.py:10-76 and
src/losses/lpips_loss.py:13-34. Architecture: torchvision AlexNet features,
taps after each of the 5 ReLUs; inputs scaled by the LPIPS shift/scale,
features channel-unit-normalized, squared diff, learned non-negative 1x1
weights, spatial mean, layer sum. Weights load via the torch converter from
`alex.pth`; random init otherwise (tests/relative comparisons)."""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv2dTorch

LPIPS_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
LPIPS_SCALE = jnp.asarray([0.458, 0.448, 0.450])

# (out_ch, kernel, stride, pad, maxpool_after)
ALEX_LAYOUT = (
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (n + eps)


class AlexNetFeatures(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (ch, k, s, p, pool) in enumerate(ALEX_LAYOUT):
            x = Conv2dTorch(ch, k, s, p, name=f"conv{i}")(x)
            x = jax.nn.relu(x)
            feats.append(x)
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips(x, y) with x, y in [-1, 1] NHWC."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        def scale(t):
            return ((t - LPIPS_SHIFT.astype(t.dtype)) /
                    LPIPS_SCALE.astype(t.dtype))

        net = AlexNetFeatures(dtype=self.dtype, name="net")
        fx = net(scale(x))
        fy = net(scale(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            w = self.param(f"lin{i}", nn.initializers.constant(1.0 / a.shape[-1]),
                           (a.shape[-1],))
            # learned weights are non-negative in LPIPS; converted weights
            # satisfy this, random init uses a uniform positive constant
            lin = jnp.sum(d * jax.nn.relu(w).astype(d.dtype), axis=-1)
            total = total + jnp.mean(lin, axis=(1, 2))
        return total
