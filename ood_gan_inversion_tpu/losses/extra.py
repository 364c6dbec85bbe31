"""Remaining framework losses from the vendored BasicSR loss layer
(BasicSR/basicsr/losses/losses.py:83-145, 363-388, 421-492) so every YAML
`type:` the reference accepts resolves here too."""

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY
from .basic import L1Loss, MSELoss, _reduce
from .gan_loss import GANLoss


@LOSS_REGISTRY.register()
class WeightedTVLoss(L1Loss):
    """Total-variation loss (losses.py:121-145): L1 of horizontal+vertical
    neighbour diffs, optionally weighted."""

    def __call__(self, pred, weight=None):
        # NHWC
        y_diff = pred[:, :-1, :, :] - pred[:, 1:, :, :]
        x_diff = pred[:, :, :-1, :] - pred[:, :, 1:, :]
        if weight is None:
            wy = wx = None
        else:
            wy = weight[:, :-1, :, :]
            wx = weight[:, :, :-1, :]
        l_y = super().__call__(y_diff, jnp.zeros_like(y_diff), weight=wy)
        l_x = super().__call__(x_diff, jnp.zeros_like(x_diff), weight=wx)
        return l_y + l_x


@LOSS_REGISTRY.register()
class MultiScaleGANLoss(GANLoss):
    """GANLoss averaged over a list of multi-scale predictions
    (losses.py:363-388): each element may itself be a list whose last entry
    is the prediction."""

    def __call__(self, preds, target_is_real, is_disc=False):
        if isinstance(preds, (list, tuple)):
            total = 0.0
            for p in preds:
                if isinstance(p, (list, tuple)):
                    p = p[-1]
                total = total + super().__call__(p, target_is_real, is_disc)
            return total / len(preds)
        return super().__call__(preds, target_is_real, is_disc)


@LOSS_REGISTRY.register()
class GANFeatLoss:
    """Discriminator feature-matching loss (losses.py:455-492)."""

    def __init__(self, criterion="l1", loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        if criterion == "l1":
            self.crit = L1Loss(1.0, reduction)
        elif criterion in ("l2", "mse"):
            self.crit = MSELoss(1.0, reduction)
        elif criterion == "charbonnier":
            from .basic import CharbonnierLoss
            self.crit = CharbonnierLoss(1.0, reduction)
        else:
            raise ValueError(f"unsupported criterion {criterion}")

    def __call__(self, pred_fake_feats, pred_real_feats):
        # feats: list over discriminators, each a list of feature maps
        if not isinstance(pred_fake_feats[0], (list, tuple)):
            pred_fake_feats = [pred_fake_feats]
            pred_real_feats = [pred_real_feats]
        num_d = len(pred_fake_feats)
        loss = 0.0
        for fd, rd in zip(pred_fake_feats, pred_real_feats):
            for f, r in zip(fd[:-1] if len(fd) > 1 else fd,
                            rd[:-1] if len(rd) > 1 else rd):
                loss = loss + self.crit(f, jax.lax.stop_gradient(r)) / num_d
        return loss * self.loss_weight


def gradient_penalty_loss(disc_fn, real, fake, rng, weight=None):
    """WGAN-GP (losses.py:421-452): penalty on the gradient norm at random
    interpolates between real and fake."""
    alpha = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1))
    interp = alpha * real + (1.0 - alpha) * fake

    def score_sum(x):
        pred = disc_fn(x)
        pred = pred[0] if isinstance(pred, tuple) else pred
        return jnp.sum(pred)

    grad = jax.grad(score_sum)(interp)
    if weight is not None:
        grad = grad * weight
    norms = jnp.sqrt(jnp.sum(jnp.square(grad).reshape(grad.shape[0], -1),
                             axis=1) + 1e-12)
    loss = jnp.mean(jnp.square(norms - 1.0))
    if weight is not None:
        loss = loss / jnp.mean(weight)
    return loss
