"""Image <-> array helpers (numpy/NHWC; the reference's img_util.py in BGR
NCHW torch). All framework tensors are RGB NHWC float in [-1, 1]."""

import os

import cv2
import numpy as np


def imread(path, float32=True):
    """Read an image file as RGB HWC float32 in [0, 1]."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"Failed to read image: {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def img2input(img, size=None, mean=0.5, std=0.5):
    """HWC [0,1] RGB -> (1, H, W, C) normalized to [-1, 1]."""
    if size is not None and img.shape[:2] != (size, size):
        img = cv2.resize(img, dsize=(size, size), interpolation=cv2.INTER_LINEAR)
    img = (img - mean) / std
    return img[None].astype(np.float32)


def tensor2img(t, rgb2bgr=True, min_max=(-1, 1)):
    """(H,W,C) or (N,H,W,C) in min_max -> uint8 HWC (BGR by default, for
    cv2.imwrite — matching the reference tensor2img contract,
    BasicSR/basicsr/utils/img_util.py:38)."""
    a = np.asarray(t, dtype=np.float32)
    if a.ndim == 4:
        a = a[0]
    a = (a - min_max[0]) / (min_max[1] - min_max[0])
    a = np.clip(a, 0, 1)
    a = (a * 255.0).round().astype(np.uint8)
    if rgb2bgr and a.shape[-1] == 3:
        a = a[..., ::-1]
    return a


def imwrite(img, path, auto_mkdir=True):
    if auto_mkdir:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ok = cv2.imwrite(path, img)
    if not ok:
        raise IOError(f"Failed to write image: {path}")


def crop_border(img, border):
    if border == 0:
        return img
    return img[border:-border, border:-border, ...]
