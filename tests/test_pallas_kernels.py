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


def test_fused_packed_stage_matches_reference():
    rs = np.random.RandomState(5)
    b, h, c1, c4 = 2, 16, 8, 16
    a = _make_args(rs, b=b, h=h, c1=c1, c4=c4)
    skip = jnp.asarray(rs.randn(b, h, h, 3).astype(np.float32))
    k3 = jnp.asarray(rs.randn(c4, 12).astype(np.float32) * 0.2)
    sr = jnp.asarray((rs.rand(b, c4) + 0.5).astype(np.float32))
    k3sr = sr[:, :, None] * k3[None]
    b3 = jnp.asarray(rs.randn(12).astype(np.float32) * 0.1)
    k4 = jnp.asarray(rs.randn(3, 3, 3, 12).astype(np.float32) * 0.1)

    from ood_gan_inversion_tpu.ops.pallas_kernels import (
        fused_packed_stage, packed_stage_reference)
    order = ["x", "n1", "n2"]
    rest = ["k1", "s1", "d1", "b1", "k2", "s2", "d2", "b2"]
    args = [a["x"], a["n1"], a["n2"], skip] + [a[k] for k in rest] + \
        [k3sr, b3, k4]
    rgb_ref, z2_ref = packed_stage_reference(*args)
    rgb, z2 = fused_packed_stage(*args)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z2_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_packed_stage_grad_matches_reference_grad():
    rs = np.random.RandomState(6)
    b, h, c1, c4 = 1, 8, 4, 8
    a = _make_args(rs, b=b, h=h, c1=c1, c4=c4)
    skip = jnp.asarray(rs.randn(b, h, h, 3).astype(np.float32))
    k3sr = jnp.asarray(rs.randn(b, c4, 12).astype(np.float32) * 0.2)
    b3 = jnp.asarray(rs.randn(12).astype(np.float32) * 0.1)
    k4 = jnp.asarray(rs.randn(3, 3, 3, 12).astype(np.float32) * 0.1)

    from ood_gan_inversion_tpu.ops.pallas_kernels import (
        fused_packed_stage, packed_stage_reference)
    rest = ["k1", "s1", "d1", "b1", "k2", "s2", "d2", "b2"]
    args = [a["x"], a["n1"], a["n2"], skip] + [a[k] for k in rest] + \
        [k3sr, b3, k4]
    idx = tuple(range(len(args)))

    def loss_ref(*xs):
        rgb, z2 = packed_stage_reference(*xs)
        return jnp.sum(rgb ** 2) + jnp.sum(z2 ** 2)

    def loss_pl(*xs):
        rgb, z2 = fused_packed_stage(*xs)
        return jnp.sum(rgb ** 2) + jnp.sum(z2 ** 2)

    g_ref = jax.grad(loss_ref, argnums=idx)(*args)
    g_pl = jax.grad(loss_pl, argnums=idx)(*args)
    for ga, gb in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)


def test_conv3x3_act_matches_reference():
    from ood_gan_inversion_tpu.ops.pallas_kernels import (
        conv3x3_act, conv3x3_act_reference)
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(2, 16, 16, 64).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.1)
    a = jnp.asarray(rs.rand(64).astype(np.float32) * 0.5)
    for act in ("prelu", "lrelu", "none"):
        ref = conv3x3_act_reference(x, k, a, act)
        got = conv3x3_act(x, k, a, act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=act)
    # grad path (rematerialized through the reference)
    g1 = jax.grad(lambda *v: jnp.sum(conv3x3_act(*v, "prelu") ** 2),
                  argnums=(0, 1, 2))(x, k, a)
    g2 = jax.grad(lambda *v: jnp.sum(conv3x3_act_reference(*v, "prelu") ** 2),
                  argnums=(0, 1, 2))(x, k, a)
    for ga, gb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)


def test_samm_bottleneck_pallas_matches_xla(monkeypatch):
    import ood_gan_inversion_tpu.nn.samm as samm_mod
    from ood_gan_inversion_tpu.nn.samm import _XavierBottleneckIR
    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.randn(1, 16, 16, 64).astype(np.float32))
    btn = _XavierBottleneckIR(64, 64)
    params = btn.init(jax.random.PRNGKey(0), x)
    monkeypatch.setattr(samm_mod, "_PALLAS_SAMM", False)
    ref = btn.apply(params, x)
    monkeypatch.setattr(samm_mod, "_PALLAS_SAMM", True)
    got = btn.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("diff", [True, False])
def test_fused_alignnet_body0_matches_reference(diff):
    from ood_gan_inversion_tpu.ops.pallas_kernels import (
        fused_alignnet_body0, alignnet_body0_reference,
        alignnet_body0_supported)
    rs = np.random.RandomState(9)
    b, h, c = 2, 16, 64
    assert alignnet_body0_supported(h, h, c)
    s = jnp.asarray(rs.randn(b, h, h, c).astype(np.float32))
    t = jnp.asarray((rs.randn(b, h, h, c) * 2 + 0.3).astype(np.float32))
    c2 = 2 * c
    g1 = jnp.asarray((rs.rand(c2) + 0.5).astype(np.float32))
    b1 = jnp.asarray(0.2 * rs.randn(c2).astype(np.float32))
    k1 = jnp.asarray(rs.randn(3, 3, c2, c2).astype(np.float32) * 0.05)
    al = jnp.asarray(rs.rand(c2).astype(np.float32) * 0.5)
    k2 = jnp.asarray(rs.randn(3, 3, c2, c2).astype(np.float32) * 0.05)
    g2 = jnp.asarray((rs.rand(c2) + 0.5).astype(np.float32))
    b2 = jnp.asarray(0.2 * rs.randn(c2).astype(np.float32))
    ref = alignnet_body0_reference(s, t, g1, b1, k1, al, k2, g2, b2, diff)
    got = fused_alignnet_body0(s, t, g1, b1, k1, al, k2, g2, b2, diff)
    assert got.shape == ref.shape == (b, h, h, c2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # grad path (rematerialized through the reference)
    args = (s, t, g1, b1, k1, al, k2, g2, b2)
    gf = jax.grad(lambda *v: jnp.sum(
        fused_alignnet_body0(*v, diff) ** 2), argnums=tuple(range(9)))(*args)
    gr = jax.grad(lambda *v: jnp.sum(
        alignnet_body0_reference(*v, diff) ** 2),
        argnums=tuple(range(9)))(*args)
    for ga, gb in zip(gf, gr):
        # backward IS the reference vjp; the residual difference is the
        # forward's fp32 noise entering through the cotangent
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=2e-3, atol=2e-3)


def test_alignnet_module_fused_matches_unfused(monkeypatch):
    import ood_gan_inversion_tpu.nn.samm as samm_mod
    from ood_gan_inversion_tpu.nn.samm import AlignNet
    rs = np.random.RandomState(10)
    s = jnp.asarray(rs.randn(2, 16, 16, 64).astype(np.float32))
    t = jnp.asarray(rs.randn(2, 16, 16, 64).astype(np.float32))
    net = AlignNet(64, scale=0.08)
    monkeypatch.setattr(samm_mod, "_SAMM_FUSED", False)
    params = net.init(jax.random.PRNGKey(0), s, t)
    ref = net.apply(params, s, t)
    monkeypatch.setattr(samm_mod, "_SAMM_FUSED", True)
    params2 = net.init(jax.random.PRNGKey(0), s, t)
    # identical param trees whichever path initializes
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, params2)
    got = net.apply(params, s, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("diff", [True, False])
def test_algebraic_alignnet_body0_matches_reference(diff):
    from ood_gan_inversion_tpu.ops.pallas_kernels import (
        algebraic_alignnet_body0, alignnet_body0_reference)
    rs = np.random.RandomState(11)
    b, h, c = 2, 16, 64
    s = jnp.asarray(rs.randn(b, h, h, c).astype(np.float32))
    t = jnp.asarray((rs.randn(b, h, h, c) * 2 + 0.3).astype(np.float32))
    c2 = 2 * c
    g1 = jnp.asarray((rs.rand(c2) + 0.5).astype(np.float32))
    b1 = jnp.asarray(0.2 * rs.randn(c2).astype(np.float32))
    k1 = jnp.asarray(rs.randn(3, 3, c2, c2).astype(np.float32) * 0.05)
    al = jnp.asarray(rs.rand(c2).astype(np.float32) * 0.5)
    k2 = jnp.asarray(rs.randn(3, 3, c2, c2).astype(np.float32) * 0.05)
    g2 = jnp.asarray((rs.rand(c2) + 0.5).astype(np.float32))
    b2 = jnp.asarray(0.2 * rs.randn(c2).astype(np.float32))
    args = (s, t, g1, b1, k1, al, k2, g2, b2)
    ref = alignnet_body0_reference(*args, diff)
    got = algebraic_alignnet_body0(*args, diff)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # pure-XLA path is plainly differentiable — grads vs the reference
    gf = jax.grad(lambda *v: jnp.sum(
        algebraic_alignnet_body0(*v, diff) ** 2),
        argnums=tuple(range(9)))(*args)
    gr = jax.grad(lambda *v: jnp.sum(
        alignnet_body0_reference(*v, diff) ** 2),
        argnums=tuple(range(9)))(*args)
    for ga, gb in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("diff", [True, False])
def test_algebraic_alignnet_body0_t_ctx_exact(diff):
    """The cross-cycle hoisted path (t_ctx from alignnet_t_context) must be
    numerically identical to the joint formulation — same ops, same order —
    and match the reference within the usual tolerance."""
    from ood_gan_inversion_tpu.ops.pallas_kernels import (
        algebraic_alignnet_body0, alignnet_body0_reference,
        alignnet_t_context)
    rs = np.random.RandomState(13)
    b, h, c = 2, 16, 64
    s = jnp.asarray(rs.randn(b, h, h, c).astype(np.float32))
    t = jnp.asarray((rs.randn(b, h, h, c) * 2 + 0.3).astype(np.float32))
    c2 = 2 * c
    g1 = jnp.asarray((rs.rand(c2) + 0.5).astype(np.float32))
    b1 = jnp.asarray(0.2 * rs.randn(c2).astype(np.float32))
    k1 = jnp.asarray(rs.randn(3, 3, c2, c2).astype(np.float32) * 0.05)
    al = jnp.asarray(rs.rand(c2).astype(np.float32) * 0.5)
    k2 = jnp.asarray(rs.randn(3, 3, c2, c2).astype(np.float32) * 0.05)
    g2 = jnp.asarray((rs.rand(c2) + 0.5).astype(np.float32))
    b2 = jnp.asarray(0.2 * rs.randn(c2).astype(np.float32))
    args = (s, t, g1, b1, k1, al, k2, g2, b2)
    ctx = alignnet_t_context(t, g1, b1, k1)
    plain = algebraic_alignnet_body0(*args, diff)
    hoisted = algebraic_alignnet_body0(*args, diff, t_ctx=ctx)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)
    ref = alignnet_body0_reference(*args, diff)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # differentiable through the hoisted context too (train path)
    def loss(s_, t_):
        ctx_ = alignnet_t_context(t_, g1, b1, k1)
        return jnp.sum(algebraic_alignnet_body0(
            s_, t_, *args[2:], diff, t_ctx=ctx_) ** 2)
    gs, gt = jax.grad(loss, argnums=(0, 1))(s, t)
    rs_, rt_ = jax.grad(lambda s_, t_: jnp.sum(alignnet_body0_reference(
        s_, t_, *args[2:], diff) ** 2), argnums=(0, 1))(s, t)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs_),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(rt_),
                               rtol=2e-3, atol=2e-3)


def test_algebraic_alignnet_body0_bf16_convs(monkeypatch):
    """OGI_SAMM_CONV_BF16=1: bf16 conv operands, fp32 stats — the result must
    track the fp32 reference within bf16 rounding of the conv chain."""
    import ood_gan_inversion_tpu.ops.pallas_kernels as pk
    rs = np.random.RandomState(12)
    b, h, c = 2, 16, 64
    s = jnp.asarray(rs.randn(b, h, h, c).astype(np.float32))
    t = jnp.asarray((rs.randn(b, h, h, c) * 2 + 0.3).astype(np.float32))
    c2 = 2 * c
    g1 = jnp.asarray((rs.rand(c2) + 0.5).astype(np.float32))
    b1 = jnp.asarray(0.2 * rs.randn(c2).astype(np.float32))
    k1 = jnp.asarray(rs.randn(3, 3, c2, c2).astype(np.float32) * 0.05)
    al = jnp.asarray(rs.rand(c2).astype(np.float32) * 0.5)
    k2 = jnp.asarray(rs.randn(3, 3, c2, c2).astype(np.float32) * 0.05)
    g2 = jnp.asarray((rs.rand(c2) + 0.5).astype(np.float32))
    b2 = jnp.asarray(0.2 * rs.randn(c2).astype(np.float32))
    args = (s, t, g1, b1, k1, al, k2, g2, b2)
    ref = pk.alignnet_body0_reference(*args)
    monkeypatch.setattr(pk, "_CONV_BF16", True)
    got = pk.algebraic_alignnet_body0(*args)
    # IN(y2) renormalizes, so bf16 conv rounding stays O(bf16 eps) relative
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    assert got.dtype == s.dtype


def test_alignnet_module_algebraic_matches_unfused(monkeypatch):
    import ood_gan_inversion_tpu.nn.samm as samm_mod
    from ood_gan_inversion_tpu.nn.samm import AlignNet
    rs = np.random.RandomState(12)
    s = jnp.asarray(rs.randn(2, 16, 16, 64).astype(np.float32))
    t = jnp.asarray(rs.randn(2, 16, 16, 64).astype(np.float32))
    net = AlignNet(64, scale=0.08)
    monkeypatch.setattr(samm_mod, "_SAMM_FUSED", False)
    monkeypatch.setattr(samm_mod, "_SAMM_ALGEBRAIC", False)
    params = net.init(jax.random.PRNGKey(0), s, t)
    ref = net.apply(params, s, t)
    monkeypatch.setattr(samm_mod, "_SAMM_ALGEBRAIC", True)
    params2 = net.init(jax.random.PRNGKey(0), s, t)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, params2)
    got = net.apply(params, s, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_batchfold_bitexact():
    """r4: small batches fold into the conv height axis with zero-row
    separators (targets the b=2/4 conv-schedule collapse). Must be
    bit-identical to the plain pad-1 conv."""
    import ood_gan_inversion_tpu.ops.pallas_kernels as pk
    from jax import lax
    r = np.random.RandomState(5)
    for b, h, w, ci, co in [(2, 9, 7, 6, 4), (4, 16, 16, 8, 8)]:
        v = jnp.asarray(r.randn(b, h, w, ci).astype(np.float32))
        k = jnp.asarray(r.randn(3, 3, ci, co).astype(np.float32))
        ref = lax.conv_general_dilated(
            v, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fold = pk._conv3x3_batchfold(v, k)
        assert float(jnp.max(jnp.abs(ref - fold))) == 0.0
