"""Reusable TPU-native ops (the replacement for the reference's CUDA layer).

Reference L1 layer: src/ops/op/{upfirdn2d,fused_act}.{py,cpp,cu}. Here every
op is an XLA-friendly jnp/lax formulation (plus optional Pallas variants in
ood_gan_inversion_tpu/ops/pallas_kernels.py) so the whole forward stays one
fused program.
"""

from .upfirdn2d import make_kernel, upfirdn2d, blur, upsample2x, downsample2x
from .fused_act import fused_leaky_relu, scaled_leaky_relu
from .modulated import modulated_conv2d, equal_linear, equal_conv2d, pixel_norm
from .resize import resize_bilinear, resize_bicubic_ac, interp_matrix
from .grid_sample import grid_sample_bilinear
from .stats import minibatch_stddev
