"""Deformable conv parity vs torchvision."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from ood_gan_inversion_tpu.ops.deform_conv import deform_conv2d


def test_deform_conv2d_vs_torchvision():
    tv = pytest.importorskip("torchvision")
    rng = np.random.RandomState(0)
    n, h, w, cin, cout, k = 2, 8, 8, 4, 6, 3
    x = rng.randn(n, h, w, cin).astype(np.float32)
    wgt = rng.randn(k, k, cin, cout).astype(np.float32)
    off = (rng.randn(n, h, w, 2 * k * k) * 0.7).astype(np.float32)
    msk = rng.rand(n, h, w, k * k).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)

    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(wgt), jnp.asarray(msk),
                                   jnp.asarray(bias), stride=1, padding=1))
    want = tv.ops.deform_conv2d(
        input=torch.from_numpy(x.transpose(0, 3, 1, 2)),
        offset=torch.from_numpy(off.transpose(0, 3, 1, 2)),
        weight=torch.from_numpy(wgt.transpose(3, 2, 0, 1)),
        bias=torch.from_numpy(bias),
        mask=torch.from_numpy(msk.transpose(0, 3, 1, 2)),
        stride=1, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_conv2d_zero_offset_equals_conv():
    import jax
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    wgt = rng.randn(3, 3, 3, 5).astype(np.float32)
    off = np.zeros((1, 8, 8, 18), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(wgt), stride=1, padding=1))
    want = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wgt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
