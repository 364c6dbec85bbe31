"""Parity tests for the Pallas fused packed conv pair (interpret mode on
CPU) against the XLA reference formulation, plus vjp wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ood_gan_inversion_tpu.ops.pallas_kernels import (
    _pair_pallas, packed_pair_reference, fused_packed_pair, pick_band,
    pallas_pair_supported)


def _make_args(rs, b=1, h=16, c1=8, c4=16):
    return dict(
        x=jnp.asarray(rs.randn(b, h, h, c1).astype(np.float32)),
        n1=jnp.asarray(0.1 * rs.randn(b, h, h, 4).astype(np.float32)),
        n2=jnp.asarray(0.1 * rs.randn(b, h, h, 4).astype(np.float32)),
        k1=jnp.asarray(rs.randn(3, 3, c1, c4).astype(np.float32) * 0.2),
        s1=jnp.asarray((rs.rand(b, c1) + 0.5).astype(np.float32)),
        d1=jnp.asarray((rs.rand(b, c4) + 0.5).astype(np.float32)),
        b1=jnp.asarray(0.1 * rs.randn(c4).astype(np.float32)),
        k2=jnp.asarray(rs.randn(3, 3, c4, c4).astype(np.float32) * 0.2),
        s2=jnp.asarray((rs.rand(b, c4) + 0.5).astype(np.float32)),
        d2=jnp.asarray((rs.rand(b, c4) + 0.5).astype(np.float32)),
        b2=jnp.asarray(0.1 * rs.randn(c4).astype(np.float32)),
    )


@pytest.mark.parametrize("b,h", [(1, 16), (2, 16), (1, 32)])
def test_pair_pallas_matches_reference(b, h):
    rs = np.random.RandomState(0)
    a = _make_args(rs, b=b, h=h)
    ref = packed_pair_reference(**a)
    got = _pair_pallas(
        a["x"], a["n1"], a["n2"], a["k1"], a["s1"], a["d1"],
        jnp.broadcast_to(a["b1"][None], (b, a["b1"].shape[0])),
        a["k2"], a["s2"], a["d2"],
        jnp.broadcast_to(a["b2"][None], (b, a["b2"].shape[0])),
        interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_packed_pair_grad_matches_reference_grad():
    rs = np.random.RandomState(1)
    a = _make_args(rs, b=1, h=8, c1=4, c4=8)
    order = ["x", "n1", "n2", "k1", "s1", "d1", "b1", "k2", "s2", "d2", "b2"]
    args = [a[k] for k in order]

    def loss_ref(*xs):
        return jnp.sum(packed_pair_reference(*xs) ** 2)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    # custom_vjp bwd re-derives through the reference, so grads must agree
    # exactly up to fwd rounding in the incoming cotangent
    g_ref2 = jax.grad(
        lambda *xs: jnp.sum(fused_packed_pair(*xs) ** 2),
        argnums=tuple(range(len(args))))(*args)
    for name, ga, gb in zip(order, g_ref, g_ref2):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_pick_band():
    assert pick_band(512, 512, 64, 128) in (8, 16, 32)
    assert pick_band(256, 256, 256, 256) in (8, 16, 32)
    assert pick_band(6, 6, 64, 128) is None
    assert pallas_pair_supported(512, 512, 64, 128)
