"""Parity tests for the ops substrate against independently-written
torch/numpy oracles (the same math the reference's CPU fallbacks compute,
re-derived from first principles — no reference code is imported)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ood_gan_inversion_tpu.ops import (
    make_kernel, upfirdn2d, blur, upsample2x, downsample2x,
    fused_leaky_relu, modulated_conv2d, equal_linear, equal_conv2d,
    pixel_norm, resize_bilinear, resize_bicubic_ac, grid_sample_bilinear,
    minibatch_stddev,
)
from ood_gan_inversion_tpu.ops.resize import adaptive_avg_pool


def upfirdn2d_oracle(x_nchw, k, up, down, pad0, pad1):
    """Direct numpy implementation of upfirdn semantics: zero-stuff (append
    up-1 zeros after each sample), pad, convolve (true convolution), decimate."""
    n, c, h, w = x_nchw.shape
    kh, kw = k.shape
    # upsample: append zeros after each sample
    up_x = np.zeros((n, c, h * up, w * up), dtype=x_nchw.dtype)
    up_x[:, :, ::up, ::up] = x_nchw
    # pad (negative = crop)
    ph0, ph1, pw0, pw1 = pad0, pad1, pad0, pad1
    padded = np.zeros((n, c, h * up + ph0 + ph1, w * up + pw0 + pw1), dtype=x_nchw.dtype)
    src = up_x[:, :, max(-ph0, 0): up_x.shape[2] - max(-ph1, 0),
               max(-pw0, 0): up_x.shape[3] - max(-pw1, 0)]
    padded[:, :, max(ph0, 0): max(ph0, 0) + src.shape[2],
           max(pw0, 0): max(pw0, 0) + src.shape[3]] = src
    # true convolution with k == cross-correlation with flipped k
    t = torch.from_numpy(padded.reshape(-1, 1, padded.shape[2], padded.shape[3]))
    wt = torch.from_numpy(np.ascontiguousarray(k[::-1, ::-1]).copy()).reshape(1, 1, kh, kw)
    out = F.conv2d(t, wt).numpy().reshape(n, c, padded.shape[2] - kh + 1, padded.shape[3] - kw + 1)
    return out[:, :, ::down, ::down]


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 2)), (2, 1, (1, 0)),
    (1, 1, (2, 1)),
])
def test_upfirdn2d_parity(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 7, 3).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    got = nchw(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad))
    want = upfirdn2d_oracle(np.transpose(x, (0, 3, 1, 2)), k, up, down, pad[0], pad[1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_downsample_shapes():
    x = jnp.ones((1, 8, 8, 4))
    k = make_kernel([1, 3, 3, 1])
    assert upsample2x(x, k).shape == (1, 16, 16, 4)
    assert downsample2x(x, k).shape == (1, 4, 4, 4)


def test_fused_leaky_relu():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 5, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    xt = torch.from_numpy(x) + torch.from_numpy(b).reshape(1, 1, 1, 8)
    want = (F.leaky_relu(xt, 0.2) * math.sqrt(2)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_equal_linear_parity():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 16).astype(np.float32)
    w = rng.randn(16, 8).astype(np.float32)   # (in, out)
    b = rng.randn(8).astype(np.float32)
    lr_mul = 0.01
    got = np.asarray(equal_linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), lr_mul))
    scale = (1 / math.sqrt(16)) * lr_mul
    want = x @ (w * scale) + b * lr_mul
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_equal_conv2d_parity():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 9, 9, 5).astype(np.float32)
    w = rng.randn(3, 3, 5, 7).astype(np.float32)   # HWIO
    b = rng.randn(7).astype(np.float32)
    got = nchw(equal_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2, padding=1))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    scale = 1 / math.sqrt(5 * 9)
    want = F.conv2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), wt * scale,
                    torch.from_numpy(b), stride=2, padding=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def modulated_conv_oracle(x_nchw, w_oihw, s, demodulate, upsample):
    """Per-sample-weight grouped conv, written directly in torch."""
    b, cin, h, wdt = x_nchw.shape
    cout, _, k, _ = w_oihw.shape
    scale = 1 / math.sqrt(cin * k * k)
    x = torch.from_numpy(x_nchw)
    weight = scale * torch.from_numpy(w_oihw)[None] * torch.from_numpy(s).view(b, 1, cin, 1, 1)
    if demodulate:
        demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
        weight = weight * demod.view(b, cout, 1, 1, 1)
    if upsample:
        x = x.reshape(1, b * cin, h, wdt)
        weight = weight.transpose(1, 2).reshape(b * cin, cout, k, k)
        out = F.conv_transpose2d(x, weight, padding=0, stride=2, groups=b)
        out = out.reshape(b, cout, out.shape[2], out.shape[3])
    else:
        x = x.reshape(1, b * cin, h, wdt)
        weight = weight.reshape(b * cout, cin, k, k)
        out = F.conv2d(x, weight, padding=k // 2, groups=b)
        out = out.reshape(b, cout, h, wdt)
    return out.numpy()


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv2d_parity(demodulate):
    rng = np.random.RandomState(4)
    x = rng.randn(3, 8, 8, 6).astype(np.float32)
    w = rng.randn(3, 3, 6, 10).astype(np.float32)
    s = (rng.randn(3, 6) * 0.5 + 1.0).astype(np.float32)
    got = nchw(modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                                demodulate=demodulate))
    want = modulated_conv_oracle(np.transpose(x, (0, 3, 1, 2)),
                                 np.transpose(w, (3, 2, 0, 1)), s, demodulate, False)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_modulated_conv2d_upsample_parity():
    """Up path: reference = conv_transpose(stride 2) then Blur(pad (1,1), gain 4)."""
    rng = np.random.RandomState(5)
    x = rng.randn(2, 6, 6, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 5).astype(np.float32)
    s = (rng.randn(2, 4) * 0.3 + 1.0).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    got = nchw(modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                                demodulate=True, upsample=True, blur_kernel=jnp.asarray(k)))
    raw = modulated_conv_oracle(np.transpose(x, (0, 3, 1, 2)),
                                np.transpose(w, (3, 2, 0, 1)), s, True, True)
    want = upfirdn2d_oracle(raw, k * 4.0, 1, 1, 1, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pixel_norm():
    rng = np.random.RandomState(6)
    x = rng.randn(4, 32).astype(np.float32)
    got = np.asarray(pixel_norm(jnp.asarray(x)))
    want = x / np.sqrt(np.mean(x ** 2, axis=-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("in_size,out_size", [(1024, 256), (17, 32), (8, 8)])
def test_resize_bilinear_vs_torch(in_size, out_size):
    rng = np.random.RandomState(7)
    x = rng.randn(1, in_size, in_size, 3).astype(np.float32)
    got = nchw(resize_bilinear(jnp.asarray(x), (out_size, out_size)))
    want = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                         (out_size, out_size), mode="bilinear").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [(16, 32), (32, 64), (31, 64)])
def test_resize_bicubic_ac_vs_torch(in_size, out_size):
    rng = np.random.RandomState(8)
    x = rng.randn(1, in_size, in_size, 2).astype(np.float32)
    got = nchw(resize_bicubic_ac(jnp.asarray(x), (out_size, out_size)))
    want = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                         (out_size, out_size), mode="bicubic", align_corners=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_adaptive_avg_pool_vs_torch():
    rng = np.random.RandomState(9)
    x = rng.randn(2, 239, 239, 3).astype(np.float32)
    got = nchw(adaptive_avg_pool(jnp.asarray(x), (112, 112)))
    want = F.adaptive_avg_pool2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                                 (112, 112)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_vs_torch():
    rng = np.random.RandomState(10)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    # identity-ish grid + random flow, matching the SAMM construction
    lin = np.linspace(-1, 1, 16, dtype=np.float32)
    gx, gy = np.meshgrid(lin, lin)
    flow = rng.randn(2, 16, 16, 2).astype(np.float32) * 0.2
    grid = np.stack([gx, gy], axis=-1)[None] + flow
    got = nchw(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    want = F.grid_sample(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                         torch.from_numpy(grid), align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_minibatch_stddev_vs_torch():
    rng = np.random.RandomState(11)
    x = rng.randn(8, 4, 4, 6).astype(np.float32)
    got = nchw(minibatch_stddev(jnp.asarray(x), stddev_group=4, stddev_feat=1))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    b, c, h, w = t.shape
    group = min(b, 4)
    std = t.view(group, -1, 1, c, h, w)
    std = torch.sqrt(std.var(0, unbiased=False) + 1e-8)
    std = std.mean([2, 3, 4], keepdims=True).squeeze(2)
    std = std.repeat(group, 1, h, w)
    want = torch.cat([t, std], 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_devices_are_virtual_8():
    assert len(jax.devices()) == 8


def test_grid_sample_modes_agree():
    from ood_gan_inversion_tpu.ops.grid_sample import (
        _grid_sample_gather4, _grid_sample_gather4_flat, _grid_sample_patch)
    rng = np.random.RandomState(13)
    x = rng.randn(3, 16, 16, 4).astype(np.float32)
    lin = np.linspace(-1, 1, 16, dtype=np.float32)
    gx, gy = np.meshgrid(lin, lin)
    flow = rng.randn(3, 16, 16, 2).astype(np.float32) * 0.2
    grid = jnp.asarray(np.stack([gx, gy], axis=-1)[None] + flow)
    ref = _grid_sample_gather4(jnp.asarray(x), grid)
    for fn in (_grid_sample_gather4_flat, _grid_sample_patch):
        got = fn(jnp.asarray(x), grid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=fn.__name__)


def test_grid_sample_gather4_packed_bitexact():
    """r4: 2-byte features gather channel PAIRS as uint32 lanes (half the
    gathered elements on the element-rate-capped TPU gather). Must be
    bit-identical to the plain gather4 — it is pure bit movement."""
    from ood_gan_inversion_tpu.ops import grid_sample as gs
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(2, 16, 12, 8).astype(np.float32)).astype(
        jnp.bfloat16)
    grid = jnp.asarray((r.rand(2, 16, 12, 2) * 2.2 - 1.1).astype(np.float32))
    plain = gs._grid_sample_gather4(x, grid)
    packed = gs._grid_sample_gather4_packed(x, grid)
    assert plain.dtype == packed.dtype
    assert bool(jnp.all(plain == packed))
    # packed is OPT-IN (lost its end-to-end A/B, PERF.md r4): the default
    # dispatch stays on the plain gather, the knob selects packing
    out = gs.grid_sample_bilinear(x, grid)
    assert bool(jnp.all(out == plain))
    orig = gs._MODE
    try:
        gs._MODE = "gather4packed"
        out_p = gs.grid_sample_bilinear(x, grid)
    finally:
        gs._MODE = orig
    assert bool(jnp.all(out_p == plain))
