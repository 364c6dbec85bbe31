"""Coverage for the long-tail reference inventory: pSp encoders, single-W
encoder, ResNetArcFace/ArcFaceLoss, LatentCodesPool (SURVEY §2.1 rows that
no shipped config exercises but the component map includes)."""

import numpy as np
import jax
import jax.numpy as jnp

from ood_gan_inversion_tpu.nn.encoders.e4e import (
    GradualStyleEncoder, BackboneEncoderUsingLastLayerIntoW)
from ood_gan_inversion_tpu.nn.arcface_resnet import ResNetArcFace
from ood_gan_inversion_tpu.losses.id_loss import ArcFaceLoss
from ood_gan_inversion_tpu.utils.latent_pool import LatentCodesPool
from ood_gan_inversion_tpu.utils.registry import LOSS_REGISTRY


def test_gradual_style_encoder_shapes():
    enc = GradualStyleEncoder(stylegan_size=64)
    x = jnp.zeros((2, 256, 256, 3))
    p = enc.init(jax.random.PRNGKey(0), x)
    w = enc.apply(p, x)
    assert w.shape == (2, 10, 512)


def test_backbone_w_encoder_repeats_single_w():
    enc = BackboneEncoderUsingLastLayerIntoW(stylegan_size=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 3))
    p = enc.init(jax.random.PRNGKey(0), x)
    w = enc.apply(p, x)
    assert w.shape == (1, 10, 512)
    # every W+ row is the same single W
    np.testing.assert_allclose(np.asarray(w[:, 0]), np.asarray(w[:, 5]),
                               rtol=1e-6)


def test_resnet_arcface_embedding():
    net = ResNetArcFace(layers=(1, 1, 1, 1), use_se=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 1))
    p = net.init(jax.random.PRNGKey(1), x)
    e = net.apply(p, x)
    assert e.shape == (2, 512)
    assert np.isfinite(np.asarray(e)).all()


def test_arcface_loss_registry_and_grad():
    assert LOSS_REGISTRY.get("ArcFaceLoss") is ArcFaceLoss
    loss = ArcFaceLoss(loss_weight=2.0, layers=(1, 1, 1, 1))
    p = loss.init(jax.random.PRNGKey(0))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 0.1
    g = jax.grad(lambda img: loss(p, img, y))(y + 0.5)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_latent_codes_pool_history():
    pool = LatentCodesPool(4, seed=3)
    first = np.random.RandomState(0).randn(2, 512).astype(np.float32)
    out = pool.query(first)
    np.testing.assert_array_equal(out, first)  # passes through while filling
    returned_old = False
    for i in range(20):
        w = np.full((2, 512), float(i + 1), np.float32)
        out = pool.query(w)
        if not np.allclose(out, w):
            returned_old = True
    assert returned_old  # history codes get replayed
    # W+ input: one random latent row is picked per sample (reference
    # latent_codes_pool.py:34-37)
    assert pool.query(np.zeros((2, 10, 512), np.float32)).shape == (2, 512)


def test_latent_codes_pool_disabled():
    pool = LatentCodesPool(0)
    w = np.ones((3, 512), np.float32)
    assert pool.query(w) is w
