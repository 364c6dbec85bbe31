"""VGG feature extractor for the perceptual loss (flax, NHWC).

Reference: BasicSR/basicsr/archs/vgg_arch.py (NAMES table + forward that
stops at the deepest requested layer). `convN_M` outputs are pre-ReLU.
Weights come from the torch->jax converter (torchvision vgg19); random init
otherwise (tests).
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv2dTorch

# (name, out_channels) per conv, pools between stages — vgg19 config 'E'
VGG19_LAYOUT: Tuple[Tuple[str, int], ...] = (
    ("conv1_1", 64), ("conv1_2", 64), ("pool", 0),
    ("conv2_1", 128), ("conv2_2", 128), ("pool", 0),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), ("pool", 0),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), ("pool", 0),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
)

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


class VGGFeatureExtractor(nn.Module):
    layer_name_list: Sequence[str] = ("conv5_4",)
    use_input_norm: bool = True
    range_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)

        wanted = set(self.layer_name_list)
        last = max(i for i, (n, _) in enumerate(VGG19_LAYOUT) if n in wanted)
        out = {}
        for i, (name, ch) in enumerate(VGG19_LAYOUT[:last + 1]):
            if name == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = Conv2dTorch(ch, 3, 1, 1, name=name)(x)
            if name in wanted:
                out[name] = x          # pre-ReLU, like the reference
            x = jax.nn.relu(x)
        return out
