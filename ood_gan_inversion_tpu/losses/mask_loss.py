"""Invertibility-mask losses (reference src/losses/mask_loss.py:9-52):
binary loss mean(min(m, 1-m)) on configured scales + area hinge
max(0, mean(m) - area) per scale, with target-0 mask inversion."""

import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register()
class MaskLoss:
    def __init__(self, loss_weight=1.0, loss_func=None, **kwargs):
        loss_func = loss_func or {}
        self.loss_weight = loss_weight
        self.binary = loss_func.get("binary", [64])
        self.area = loss_func.get("area", {"64": 0.35, "128": 0.01, "256": 0.01})
        self.target = loss_func.get("target", 0)
        self.binary_weight = loss_func.get("binary_weight", 0.5)

    def __call__(self, aligns: dict):
        """aligns: {scale_index_or_size: (B, h, w, >=3)}; mask = channel 2
        (the full-res composite entry stores the mask replicated to 3ch, so
        channel 2 is still the mask)."""
        total_bin = 0.0
        total_area = 0.0
        for _, align in aligns.items():
            mask = align[..., 2:]
            size = mask.shape[1]
            if size in self.binary:
                total_bin = total_bin + jnp.mean(jnp.minimum(mask, 1.0 - mask))
            if str(size) in self.area:
                m = 1.0 - mask if self.target == 0 else mask
                avg_area = jnp.mean(m)
                total_area = total_area + jnp.maximum(
                    0.0, avg_area - self.area[str(size)])
        return (total_bin * self.binary_weight * self.loss_weight,
                total_area * self.loss_weight)
