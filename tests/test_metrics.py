"""Metric protocol tests."""

import numpy as np
import pytest

from ood_gan_inversion_tpu.metrics import (calculate_psnr, calculate_ssim,
                                           frechet_distance, feature_stats)
from ood_gan_inversion_tpu.metrics.niqe import (niqe_score,
                                                default_gaussian_window)


def test_psnr_ssim_identity():
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    assert calculate_psnr(img, img, crop_border=2) == float("inf")
    assert calculate_ssim(img, img, crop_border=2) == pytest.approx(1.0, abs=1e-6)


def test_psnr_vs_known_value():
    a = np.zeros((16, 16, 3), np.uint8)
    b = np.full((16, 16, 3), 10, np.uint8)
    got = calculate_psnr(a, b, crop_border=0)
    want = 20 * np.log10(255.0 / 10.0)
    assert got == pytest.approx(want, rel=1e-6)


def test_frechet_distance_zero_and_shifted():
    rng = np.random.RandomState(1)
    f1 = rng.randn(500, 8)
    mu, sig = feature_stats(f1)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)
    mu2 = mu + 1.0
    d = frechet_distance(mu, sig, mu2, sig)
    assert d == pytest.approx(8.0, rel=1e-6)  # ||1||^2 over 8 dims


def test_niqe_runs_with_synthetic_pris():
    rng = np.random.RandomState(2)
    img = (rng.rand(192, 192) * 255)
    # synthetic pristine model: identity-ish cov, zero mean of features
    mu = np.zeros(36)
    cov = np.eye(36)
    s = niqe_score(img, mu, cov, default_gaussian_window())
    assert np.isfinite(s) and s > 0


def test_inception_v3_fid_arch():
    import jax
    import jax.numpy as jnp
    from ood_gan_inversion_tpu.nn.inception import InceptionV3FID
    net = InceptionV3FID()
    rng = jax.random.PRNGKey(0)
    x = jnp.clip(jax.random.normal(rng, (2, 299, 299, 3)) * 0.2 + 0.5, 0, 1)
    params = net.init(rng, x)
    feats = net.apply(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()
