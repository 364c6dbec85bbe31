"""LPIPS_Loss — registry twin of the reference's src/losses/lpips_loss.py:
13-34 (an `lpips.LPIPS(net='alex')` wrapper registered under LOSS_REGISTRY).
The OOD model never consumes it (no lpips_opt hook in
OOD_faceGAN_model.py), but it is part of the reference's loss registry
surface, so a config that builds it must work here too.

Semantics mirrored exactly, including the double-normalize quirk: the
reference first min-max-rescales pred/target to [0, 1] (min_max=(0, 1)
default leaves [-1, 1] inputs UNCHANGED) and then calls the lpips package
with normalize=True, which applies 2x-1 again — so [-1, 1] model outputs
reach the net in [-3, 1]. Mirror, don't fix: the loss VALUES must match a
reference run using this class.
"""

from typing import Any

import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY
from ..nn.lpips import LPIPS


@LOSS_REGISTRY.register()
class LPIPS_Loss:
    """lpips_loss(pred, target) with NHWC inputs. Functional: the AlexNet +
    lin params are passed per call (they live in the model's loss_net_params
    subtree like the VGG/ArcFace loss nets)."""

    def __init__(self, loss_weight: float = 1.0, min_max=(0.0, 1.0),
                 net: str = "alex", model_path: Any = None,
                 reduction: str = "mean"):
        if net != "alex":
            raise NotImplementedError(
                "LPIPS_Loss: only the alex net is supported (the reference "
                "default, src/losses/lpips_loss.py:14)")
        self.loss_weight = float(loss_weight)
        self.min_max = (float(min_max[0]), float(min_max[1]))
        self.reduction = reduction
        self.net = LPIPS()

    def init_params(self, rng, image_size: int = 256):
        z = jnp.zeros((1, image_size, image_size, 3))
        return self.net.init(rng, z, z)

    def __call__(self, params, pred, target, normalize: bool = True):
        if normalize:
            lo, hi = self.min_max
            pred = (pred - lo) / (hi - lo)
            target = (target - lo) / (hi - lo)
            # the lpips package's normalize=True: [0,1] -> 2x-1
            pred = pred * 2.0 - 1.0
            target = target * 2.0 - 1.0
        d = self.net.apply(params, pred, target)
        if self.reduction == "mean":
            d = jnp.mean(d)
        elif self.reduction == "sum":
            d = jnp.sum(d)
        return d * self.loss_weight, None
