"""FID (Frechet Inception Distance) machinery.

Reference: BasicSR/basicsr/metrics/fid.py. The Frechet-distance math and
feature statistics are self-contained; the feature extractor is pluggable —
pass any callable mapping an image batch (N, 299, 299, 3) in [0,1] to
(N, D) features (e.g. a converted InceptionV3 pool3 head; until those
weights are supplied, any fixed embedding net gives a *relative* FID)."""

import numpy as np
from scipy import linalg

from ..utils.registry import METRIC_REGISTRY


def feature_stats(features: np.ndarray):
    """(mu, sigma) of (N, D) activations."""
    features = np.asarray(features, dtype=np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """d^2 = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)), Sutherland-stable
    (reference fid.py:52-99)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real

    diff = mu1 - mu2
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def extract_features(data_iter, extractor, batch_postproc=None):
    """Accumulate (N, D) features over an iterator of image batches."""
    feats = []
    for batch in data_iter:
        f = np.asarray(extractor(batch))
        if batch_postproc is not None:
            f = batch_postproc(f)
        feats.append(f.reshape(f.shape[0], -1))
    return np.concatenate(feats, axis=0)


@METRIC_REGISTRY.register()
def calculate_fid(feats1=None, feats2=None, stats1=None, stats2=None,
                  **kwargs):
    """FID from raw feature arrays or precomputed (mu, sigma) stats."""
    if stats1 is None:
        stats1 = feature_stats(feats1)
    if stats2 is None:
        stats2 = feature_stats(feats2)
    return frechet_distance(stats1[0], stats1[1], stats2[0], stats2[1])
