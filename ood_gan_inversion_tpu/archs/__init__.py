"""Network architectures, registered under ARCH_REGISTRY by import."""

from ..utils.registry import ARCH_REGISTRY
from .ood_e4e import OODFaceGANE4E
from .ood_restyle import OODFaceGANReStyle
from .ood_featurestyle import OODFaceGANFeatureStyle
from .discriminators import StyleGAN2DiscriminatorMod, LatentDiscriminator


def build_network(opt: dict):
    """Reference `build_network` (BasicSR/basicsr/archs/__init__.py:19):
    pop `type`, look up the arch class, construct with the remaining keys.
    A string `dtype` (YAML-friendly, e.g. "bfloat16") is normalized to the
    jnp scalar type so in-arch dtype comparisons work."""
    import jax.numpy as jnp

    opt = dict(opt)
    net_type = opt.pop("type")
    if isinstance(opt.get("dtype"), str):
        opt["dtype"] = jnp.dtype(opt["dtype"]).type
    return ARCH_REGISTRY.get(net_type)(**opt)
