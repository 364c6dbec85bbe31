"""Parity tests for the polyphase-packed generator tail (ops/polyphase.py):
the packed coarse-resolution formulation must be the exact same linear
algebra as the naive fine-resolution chain (modulated upsample-conv + blur,
same-res 3x3 conv, ToRGB + skip upsample)."""

import numpy as np
import jax
import jax.numpy as jnp

import ood_gan_inversion_tpu.nn.stylegan2 as sg2
from ood_gan_inversion_tpu.nn.stylegan2 import Generator
from ood_gan_inversion_tpu.ops.modulated import modulated_conv2d
from ood_gan_inversion_tpu.ops.upfirdn2d import make_kernel, upsample2x
from ood_gan_inversion_tpu.ops.polyphase import (
    pack_space_to_depth, unpack_depth_to_space, upconv_blur_packed_kernel,
    conv3x3_packed_kernel, conv1x1_packed_kernel, skip_up_packed_kernel,
    conv_packed, tile_phase_major)

BLUR = make_kernel((1, 3, 3, 1))


def test_pack_unpack_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 10, 5))
    assert jnp.allclose(unpack_depth_to_space(pack_space_to_depth(x), 5), x)


def test_upconv_blur_packed_matches_modulated_upsample():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 5).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 5, 7).astype(np.float32))
    s = jnp.asarray(rs.rand(2, 5).astype(np.float32) + 0.5)

    ref = modulated_conv2d(x, w, s, demodulate=True, upsample=True,
                           blur_kernel=jnp.asarray(BLUR))

    from ood_gan_inversion_tpu.ops.modulated import demod_scale
    import math
    w_scaled = w * (1.0 / math.sqrt(5 * 9))
    k1 = upconv_blur_packed_kernel(w_scaled, BLUR)
    z = conv_packed(x * s[:, None, None, :], k1)
    d = demod_scale(w_scaled, s)
    z = z * tile_phase_major(d)[:, None, None, :]
    out = unpack_depth_to_space(z, 7)
    assert out.shape == ref.shape == (2, 16, 16, 7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv3x3_packed_matches_fine_conv():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 16, 16, 6).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 6, 4).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k2 = conv3x3_packed_kernel(w)
    out = unpack_depth_to_space(conv_packed(pack_space_to_depth(x), k2), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv1x1_packed_matches_fine_conv():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 8, 8, 6).astype(np.float32))
    w = jnp.asarray(rs.randn(1, 1, 6, 3).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k3 = conv1x1_packed_kernel(w)
    out = unpack_depth_to_space(
        conv_packed(pack_space_to_depth(x), k3, padding=0), 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_skip_up_packed_matches_upsample2x():
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 9, 9, 3).astype(np.float32))
    ref = upsample2x(x, jnp.asarray(BLUR))
    k4 = skip_up_packed_kernel(BLUR, 3)
    out = unpack_depth_to_space(conv_packed(x, k4), 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_generator_decode_matches_naive(monkeypatch):
    """Full generator decode, packed tail vs naive, identical explicit
    noise. _PACKED_MIN_RES lowered so a small CPU-size generator exercises
    the packed path on its 32/64px stages."""
    monkeypatch.setattr(sg2, "_PACKED_TAIL", True)
    monkeypatch.setattr(sg2, "_PACKED_MIN_RES", 32)

    gen = Generator(size=64, style_dim=64, n_mlp=2, channel_multiplier=1)
    rng = jax.random.PRNGKey(0)
    lats = jax.random.normal(rng, (2, 10, 64))
    params = gen.init({"params": rng, "noise": rng}, lats, packed=False)

    # bump noise weights (zero-init) so the noise path is checked too
    def bump(path, p):
        keys = [getattr(k, "key", "") for k in path]
        if "noise" in keys and keys[-1] == "weight":
            return jnp.full_like(p, 0.3)
        return p
    params = jax.tree_util.tree_map_with_path(bump, params)
    sizes = [4, 8, 8, 16, 16, 32, 32, 64, 64]
    noise = [jax.random.normal(jax.random.PRNGKey(7 + i), (2, s, s, 1))
             for i, s in enumerate(sizes)]

    ref = gen.apply(params, lats, noise=noise, packed=False)
    out = gen.apply(params, lats, noise=noise, packed=True)
    assert out.shape == ref.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
