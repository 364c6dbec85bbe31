"""Minibatch statistics ops for the StyleGAN2 discriminator."""

import jax.numpy as jnp


def minibatch_stddev(x: jnp.ndarray, stddev_group: int = 4,
                     stddev_feat: int = 1) -> jnp.ndarray:
    """Append the group-stddev feature map channel.

    NHWC equivalent of the reference discriminator tail
    (src/ops/StyleGAN/model.py:725-733 / stylegan2_arch.py:816-830):
    split the batch into groups, compute the per-group stddev over the batch
    axis, average over channels+space, and broadcast back as one extra channel.
    """
    b, h, w, c = x.shape
    group = min(b, stddev_group)
    y = x.reshape(group, -1, h, w, stddev_feat, c // stddev_feat)
    var = jnp.var(y, axis=0)                          # biased, like torch unbiased=False
    std = jnp.sqrt(var + 1e-8)
    std = jnp.mean(std, axis=(1, 2, 4), keepdims=True)  # mean over h, w, c-per-feat
    std = jnp.squeeze(std, axis=4)                      # (b/group, 1, 1, feat)
    std = jnp.tile(std, (group, h, w, 1))
    return jnp.concatenate([x, std], axis=-1)
