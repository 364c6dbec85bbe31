"""Pure-XLA banded-matmul warp vs the gather reference formulation.

Plan-B gather bypass for the SAMM warp (nn/samm.py OGI_XLA_WARP; reference
workload SAMM/helpers.py:170-177) — unlike the Pallas MXU kernel it keeps
XLA's global fusion intact, so it must be exactly interchangeable.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ood_gan_inversion_tpu.ops import matmul_warp as mw
from ood_gan_inversion_tpu.ops.pallas_warp import (max_disp_px,
                                                   warp_blend_reference)
from tests.test_pallas_warp import _mk


@pytest.mark.parametrize("b,size,c,scale", [
    (1, 32, 128, 0.08),
    (2, 64, 128, 0.08),
    (1, 32, 64, 0.02),
    (3, 16, 8, 0.1),
])
def test_matches_reference(b, size, c, scale):
    x, grid, alpha = _mk(b, size, c, scale)
    p = max_disp_px(scale, size)
    ref = warp_blend_reference(x, grid, alpha)
    out = mw.xla_warp_blend(x, grid, alpha, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_extreme_flow_at_bound():
    """Flow pinned at +-scale plus border pixels: the zero-padding
    semantics and window bounds must still match."""
    b, size, c, scale = 1, 32, 16, 0.1
    x, grid, alpha = _mk(b, size, c, scale, seed=3)
    rs = np.random.RandomState(4)
    sign = jnp.asarray(np.sign(rs.randn(b, size, size, 2)), jnp.float32)
    lin = jnp.linspace(-1.0, 1.0, size, dtype=jnp.float32)
    base = jnp.stack([jnp.broadcast_to(lin[None, :], (size, size)),
                      jnp.broadcast_to(lin[:, None], (size, size))],
                     axis=-1)
    grid = base[None] + sign * scale
    p = max_disp_px(scale, size)
    ref = warp_blend_reference(x, grid, alpha)
    out = mw.xla_warp_blend(x, grid, alpha, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    b, size, c, scale = 1, 16, 8, 0.08
    x, grid, alpha = _mk(b, size, c, scale, seed=5)
    p = max_disp_px(scale, size)
    loss = lambda fn: lambda *a: jnp.sum(fn(*a) ** 2)
    gx_r = jax.grad(loss(warp_blend_reference), argnums=(0, 1, 2))(
        x, grid, alpha)
    gx_o = jax.grad(loss(lambda *a: mw.xla_warp_blend(*a, p)),
                    argnums=(0, 1, 2))(x, grid, alpha)
    for a, b_ in zip(gx_o, gx_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_spmwarp_with_xla_warp_matches_default(monkeypatch):
    """The SPMWarp module under OGI_XLA_WARP must reproduce the default
    gather path bit-for-bit (within fp tolerance) through cycle-2 and the
    alpha blend."""
    import ood_gan_inversion_tpu.nn.samm as samm_mod
    from ood_gan_inversion_tpu.nn.samm import SPMWarp
    rs = np.random.RandomState(7)
    src = jnp.asarray(rs.randn(2, 32, 32, 64).astype(np.float32))
    tgt = jnp.asarray(rs.randn(2, 32, 32, 64).astype(np.float32))
    net = SPMWarp(64, scale=0.08, cycle_align=2)
    params = net.init(jax.random.PRNGKey(0), src, tgt)
    ref = net.apply(params, src, tgt)
    monkeypatch.setattr(samm_mod, "_XLA_WARP", True)
    monkeypatch.setattr(samm_mod, "_MXU_WARP_MIN", 16)
    out = net.apply(params, src, tgt)
    for a, b_ in zip(jax.tree_util.tree_leaves(out),
                     jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_bf16_bands_track_fp32(monkeypatch):
    """OGI_XLA_WARP_BF16=1: bf16 bands/dot, fp32 epilogue — must track the
    fp32 reference within bf16 rounding and keep the output dtype."""
    monkeypatch.setattr(mw, "_BF16", True)
    b, size, c, scale = 2, 32, 64, 0.08
    x, grid, alpha = _mk(b, size, c, scale, seed=9)
    p = max_disp_px(scale, size)
    ref = warp_blend_reference(x, grid, alpha)
    out = mw.xla_warp_blend(x, grid, alpha, p)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.02, atol=0.02)
