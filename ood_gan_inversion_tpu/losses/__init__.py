"""Losses, registered under LOSS_REGISTRY (the reference's loss layer:
src/losses/ + BasicSR/basicsr/losses/losses.py)."""

from ..utils.registry import LOSS_REGISTRY
from .gan_loss import GANLoss, r1_penalty_fn, path_regularize_stats
from .basic import MSELoss, L1Loss
from .mask_loss import MaskLoss
from .perceptual import PerceptualLoss
from .id_loss import IDLoss
from .extra import (WeightedTVLoss, MultiScaleGANLoss, GANFeatLoss,
                    gradient_penalty_loss)
from .lpips_loss import LPIPS_Loss


def build_loss(opt: dict):
    opt = dict(opt)
    loss_type = opt.pop("type")
    return LOSS_REGISTRY.get(loss_type)(**opt)
