"""GOLDEN metric parity against the ACTUAL BasicSR metric implementations.

Loads the real reference metric files (torch/numpy/cv2-only leaves) from
/root/reference/BasicSR and asserts our ports reproduce them on random
images — including the full NIQE chain (MSCN -> AGGD fits -> pristine-model
Mahalanobis with the shipped niqe_pris_params.npz) and the protocol-exact
Y-channel PSNR/SSIM used by options/test/E4E_Face_test.yml.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from ref_compat import load_real_basicsr, REFERENCE_ROOT


@pytest.fixture(scope="module")
def ref_metrics():
    load_real_basicsr("basicsr.utils.matlab_functions")
    load_real_basicsr("basicsr.metrics.metric_util")
    psnr_ssim = load_real_basicsr("basicsr.metrics.psnr_ssim")
    niqe = load_real_basicsr("basicsr.metrics.niqe")
    return psnr_ssim, niqe


def _pair(seed=0, size=96):
    rs = np.random.RandomState(seed)
    img = rs.randint(0, 256, (size, size, 3)).astype(np.float64)
    img2 = np.clip(img + rs.randn(size, size, 3) * 12, 0, 255).round()
    return img, img2


@pytest.mark.parametrize("crop,y", [(0, False), (2, False), (2, True)])
def test_psnr_golden(ref_metrics, crop, y):
    from ood_gan_inversion_tpu.metrics.psnr_ssim import calculate_psnr
    img, img2 = _pair(1)
    r = ref_metrics[0].calculate_psnr(img, img2, crop_border=crop,
                                      test_y_channel=y)
    o = calculate_psnr(img, img2, crop_border=crop, test_y_channel=y)
    # the reference's bgr2ycbcr computes in float32; budget its rounding
    np.testing.assert_allclose(o, r, rtol=1e-6 if y else 1e-8)


@pytest.mark.parametrize("crop,y", [(0, False), (2, True)])
def test_ssim_golden(ref_metrics, crop, y):
    from ood_gan_inversion_tpu.metrics.psnr_ssim import calculate_ssim
    img, img2 = _pair(2)
    r = ref_metrics[0].calculate_ssim(img, img2, crop_border=crop,
                                      test_y_channel=y)
    o = calculate_ssim(img, img2, crop_border=crop, test_y_channel=y)
    # the reference's bgr2ycbcr computes in float32; budget its rounding
    np.testing.assert_allclose(o, r, rtol=1e-6 if y else 1e-8)


def test_niqe_golden(ref_metrics):
    from ood_gan_inversion_tpu.metrics.niqe import calculate_niqe
    rs = np.random.RandomState(3)
    # structured image (pure noise degenerates the AGGD fits): smooth ramps
    # plus texture, uint8 BGR as the protocol feeds it
    yy, xx = np.mgrid[0:192, 0:192]
    base = (96 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 23.0))
    img = np.clip(base[..., None] + rs.randn(192, 192, 3) * 20,
                  0, 255).astype(np.uint8)
    r = ref_metrics[1].calculate_niqe(img, crop_border=0)
    o = calculate_niqe(
        img, crop_border=0,
        pris_params_path=(f"{REFERENCE_ROOT}/BasicSR/basicsr/metrics/"
                          "niqe_pris_params.npz"))
    np.testing.assert_allclose(o, r, rtol=1e-5)
