"""Parity tests for data/transforms.py against the ACTUAL reference
implementation (BasicSR matlab_functions.imresize / transforms.augment),
imported from /root/reference and run on CPU."""

import importlib.util
import random as pyrandom

import numpy as np
import pytest

from ood_gan_inversion_tpu.data.transforms import (augment, imresize,
                                                   mod_crop,
                                                   paired_random_crop)


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_matlab():
    return _load_ref(
        "ref_matlab_functions",
        "/root/reference/BasicSR/basicsr/utils/matlab_functions.py")


@pytest.mark.parametrize("scale,antialias", [
    (0.5, True), (0.25, True), (0.5, False), (2.0, True),
    (1.3, True), (0.7, True), (0.7, False),
])
def test_imresize_matches_reference(ref_matlab, scale, antialias):
    img = np.random.RandomState(0).rand(37, 29, 3).astype(np.float32)
    ours = imresize(img, scale, antialiasing=antialias)
    ref = ref_matlab.imresize(img, scale, antialiasing=antialias)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_imresize_grayscale_matches_reference(ref_matlab):
    img = np.random.RandomState(1).rand(41, 33).astype(np.float32)
    ours = imresize(img, 0.5)
    ref = ref_matlab.imresize(img, 0.5)
    assert ours.ndim == 2 and ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_mod_crop():
    img = np.arange(7 * 9 * 3, dtype=np.float32).reshape(7, 9, 3)
    out = mod_crop(img, 4)
    assert out.shape == (4, 8, 3)
    np.testing.assert_array_equal(out, img[:4, :8])
    with pytest.raises(ValueError):
        mod_crop(img[None], 4)


def test_paired_random_crop_alignment():
    rng = np.random.default_rng(0)
    gt = np.random.RandomState(2).rand(64, 64, 3).astype(np.float32)
    lq = gt[::4, ::4].copy()  # exact 4x decimation keeps pixels comparable
    gt_c, lq_c = paired_random_crop(gt, lq, 32, 4, rng=rng)
    assert gt_c.shape == (32, 32, 3) and lq_c.shape == (8, 8, 3)
    # the crops must cover the SAME region: decimating the gt crop
    # reproduces the lq crop exactly
    np.testing.assert_array_equal(gt_c[::4, ::4], lq_c)
    with pytest.raises(ValueError):
        paired_random_crop(gt, lq[:2], 32, 4, rng=rng)
    with pytest.raises(ValueError):
        paired_random_crop(gt, lq, 256, 4, rng=rng)


class _ScriptedRng:
    """Yields a fixed sequence from .random() to pin the augment draws."""

    def __init__(self, vals):
        self.vals = list(vals)

    def random(self):
        return self.vals.pop(0)


@pytest.mark.parametrize("draws", [
    (0.1, 0.1, 0.1), (0.9, 0.9, 0.9), (0.1, 0.9, 0.1), (0.9, 0.1, 0.9),
])
def test_augment_matches_reference(monkeypatch, draws):
    ref = _load_ref("ref_transforms",
                    "/root/reference/BasicSR/basicsr/data/transforms.py")
    imgs = [np.random.RandomState(i).rand(8, 8, 3).astype(np.float32)
            for i in range(2)]
    flow = np.random.RandomState(9).rand(8, 8, 2).astype(np.float32)

    seq = list(draws)
    monkeypatch.setattr(pyrandom, "random", lambda: seq.pop(0))
    ref_imgs, ref_flow, = ref.augment([v.copy() for v in imgs], flows=flow.copy())

    ours_imgs, ours_flow, status = augment(
        [v.copy() for v in imgs], flows=flow.copy(), return_status=True,
        rng=_ScriptedRng(draws))
    assert status == tuple(d < 0.5 for d in draws)
    for o, r in zip(ours_imgs, ref_imgs):
        np.testing.assert_array_equal(o, r)
    np.testing.assert_array_equal(ours_flow, ref_flow)
