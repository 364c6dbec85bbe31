"""PSNR / SSIM with the reference's exact protocol
(BasicSR/basicsr/metrics/psnr_ssim.py:9-128): uint8 HWC (BGR) inputs,
crop_border, optional Y-channel (ITU-R BT.601 via the matlab-style
bgr2ycbcr), 11x11 sigma-1.5 Gaussian SSIM per channel."""

import cv2
import numpy as np

from ..utils.registry import METRIC_REGISTRY


def bgr2ycbcr_y(img01: np.ndarray) -> np.ndarray:
    """BGR float [0,1] -> Y float: matlab convention
    (BasicSR matlab_functions.py:214). The float32 output cast matches the
    reference's _convert_output_type_range — NIQE rounds the Y image, so
    fp64-vs-fp32 ties at .5 otherwise shift whole grey levels."""
    y = np.dot(img01, [24.966, 128.553, 65.481]) + 16.0
    return (y / 255.0).astype(np.float32)


def to_y_channel(img: np.ndarray) -> np.ndarray:
    img = img.astype(np.float32) / 255.0
    if img.ndim == 3 and img.shape[2] == 3:
        img = bgr2ycbcr_y(img)
        img = img[..., None]
    return img * 255.0


@METRIC_REGISTRY.register()
def calculate_psnr(img, img2, crop_border, input_order="HWC",
                   test_y_channel=False, **kwargs):
    assert img.shape == img2.shape
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    mse = np.mean((img - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _ssim_one(img, img2):
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1 ** 2
    mu2_sq = mu2 ** 2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = (((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) /
                ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return ssim_map.mean()


@METRIC_REGISTRY.register()
def calculate_ssim(img, img2, crop_border, input_order="HWC",
                   test_y_channel=False, **kwargs):
    assert img.shape == img2.shape
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    ssims = [_ssim_one(img[..., i], img2[..., i]) for i in range(img.shape[2])]
    return float(np.mean(ssims))
