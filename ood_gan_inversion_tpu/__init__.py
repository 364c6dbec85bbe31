"""TPU-native OOD GAN inversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
"Out-of-domain GAN inversion via Invertibility Decomposition" (ICCV 2023)
reference implementation (see /root/reference): StyleGAN2 W+ inversion with
SAMM spatial alignment + invertibility-mask blending, three encoder families
(E4E / ReStyle / FeatureStyle), GAN training with three optimizers, and a
YAML-driven experiment runtime.

Design stance (TPU-first, not a port):
  * NHWC layouts everywhere; convs stay on the MXU.
  * Per-sample modulated conv is the scaled-input/scaled-output rewrite, not
    the groups=batch trick (reference src/ops/StyleGAN/model.py:233-274).
  * The generator<->SAMM coupling is explicit dataflow (aligns returned as
    outputs), not a Python callback with hidden module state.
  * One jitted train step over a jax.sharding.Mesh replaces DDP/NCCL.
  * Checkpoints are orbax pytrees; pretrained torch weights enter through a
    one-time converter (tools/convert_torch_weights.py).
"""

__version__ = "0.1.0"
