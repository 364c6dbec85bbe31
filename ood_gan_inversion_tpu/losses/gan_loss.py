"""GAN losses + gradient regularizers.

Reference: BasicSR/basicsr/losses/losses.py:258-418. R1 and path-length are
expressed with jax.grad instead of torch.autograd.grad; the reference's
`0 * pred` DDP-unused-parameter hacks (src/models/OOD_faceGAN_model.py:607,
647, 773) have no JAX analogue and disappear.
"""

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register()
class GANLoss:
    """gan_type in {vanilla, lsgan, wgan, wgan_softplus, hinge}."""

    def __init__(self, gan_type: str = "wgan_softplus", real_label_val=1.0,
                 fake_label_val=0.0, loss_weight: float = 1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight

    def __call__(self, pred, target_is_real: bool, is_disc: bool = False):
        t = self.gan_type
        if t == "hinge":
            if is_disc:
                x = -pred if target_is_real else pred
                loss = jnp.mean(jax.nn.relu(1.0 + x))
            else:
                loss = -jnp.mean(pred)
        elif t == "wgan":
            loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
        elif t == "wgan_softplus":
            loss = (jnp.mean(jax.nn.softplus(-pred)) if target_is_real
                    else jnp.mean(jax.nn.softplus(pred)))
        elif t == "vanilla":
            label = self.real_label_val if target_is_real else self.fake_label_val
            # BCE-with-logits
            loss = jnp.mean(jnp.maximum(pred, 0) - pred * label +
                            jnp.log1p(jnp.exp(-jnp.abs(pred))))
        elif t == "lsgan":
            label = self.real_label_val if target_is_real else self.fake_label_val
            loss = jnp.mean(jnp.square(pred - label))
        else:
            raise NotImplementedError(f"gan_type {t}")
        return loss if is_disc else loss * self.loss_weight


def r1_penalty_fn(disc_fn: Callable, real: jnp.ndarray) -> jnp.ndarray:
    """R1 = mean_b sum(grad_x D(x)^2) (losses.py:391-405). `disc_fn` maps an
    image batch to per-sample scores."""
    def score_sum(x):
        pred = disc_fn(x)
        pred = pred[0] if isinstance(pred, tuple) else pred
        return jnp.sum(pred)

    grad = jax.grad(score_sum)(real)
    return jnp.mean(jnp.sum(jnp.square(grad).reshape(real.shape[0], -1), axis=1))


def path_regularize_stats(grad_wrt_latents, mean_path_length, decay=0.01):
    """Given d(sum(fake*noise))/d(latents) (B, n_latent, D), return
    (path_penalty, mean path length, updated running mean)
    (losses.py:408-418)."""
    path_lengths = jnp.sqrt(jnp.mean(
        jnp.sum(jnp.square(grad_wrt_latents), axis=2), axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    path_penalty = jnp.mean(jnp.square(path_lengths - path_mean))
    return path_penalty, jnp.mean(path_lengths), jax.lax.stop_gradient(path_mean)
