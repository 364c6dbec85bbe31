"""Pixel losses (BasicSR/basicsr/losses/losses.py:15-80)."""

import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY


def _reduce(x, reduction):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


@LOSS_REGISTRY.register()
class L1Loss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        d = jnp.abs(pred - target)
        if weight is not None:
            d = d * weight
        return self.loss_weight * _reduce(d, self.reduction)


@LOSS_REGISTRY.register()
class MSELoss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        d = jnp.square(pred - target)
        if weight is not None:
            d = d * weight
        return self.loss_weight * _reduce(d, self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss:
    def __init__(self, loss_weight=1.0, reduction="mean", eps=1e-12):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        d = jnp.sqrt(jnp.square(pred - target) + self.eps)
        if weight is not None:
            d = d * weight
        return self.loss_weight * _reduce(d, self.reduction)
