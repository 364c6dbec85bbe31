"""Flax building blocks (NHWC) for the StyleGAN2 / encoder / SAMM stacks."""

from .layers import (
    EqualLinear, EqualConv2d, FusedLeakyReLU, PReLU, SEModule,
    BatchNorm2dEval, InstanceNorm2d, ConvLayer, ResBlock, norm_layer,
    torch_conv_init, torch_bias_init,
)
from .stylegan2 import (
    ModulatedConv2d, NoiseInjection, StyledConv, ToRGB, Generator,
    Discriminator, STYLEGAN2_CHANNELS, feature_modulation,
)
from .stylegan2_gpen import GPENGenerator
from .gcfsr import GCFSRGenerator, FeatureModulation
