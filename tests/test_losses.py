"""Loss semantics tests (oracles written from the formulas directly)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ood_gan_inversion_tpu.losses import (GANLoss, MSELoss, MaskLoss,
                                          PerceptualLoss, IDLoss, build_loss)
from ood_gan_inversion_tpu.losses.gan_loss import (r1_penalty_fn,
                                                   path_regularize_stats)


def test_gan_loss_wgan_softplus():
    g = GANLoss("wgan_softplus", loss_weight=0.5)
    pred = jnp.asarray(np.random.RandomState(0).randn(4, 1).astype(np.float32))
    pt = torch.from_numpy(np.asarray(pred))
    # D: real + fake
    np.testing.assert_allclose(
        float(g(pred, True, is_disc=True)),
        float(F.softplus(-pt).mean()), rtol=1e-5)
    np.testing.assert_allclose(
        float(g(pred, False, is_disc=True)),
        float(F.softplus(pt).mean()), rtol=1e-5)
    # G: nonsaturating, weighted
    np.testing.assert_allclose(
        float(g(pred, True, is_disc=False)),
        0.5 * float(F.softplus(-pt).mean()), rtol=1e-5)


def test_gan_loss_vanilla_matches_bce():
    g = GANLoss("vanilla")
    pred = jnp.asarray(np.random.RandomState(1).randn(8).astype(np.float32))
    pt = torch.from_numpy(np.asarray(pred))
    want = F.binary_cross_entropy_with_logits(pt, torch.ones_like(pt))
    np.testing.assert_allclose(float(g(pred, True, is_disc=True)),
                               float(want), rtol=1e-5)


def test_r1_penalty():
    # D(x) = sum of squares -> grad = 2x -> penalty = mean_b sum (2x)^2
    x = jnp.asarray(np.random.RandomState(2).randn(3, 4, 4, 1).astype(np.float32))
    disc = lambda im: jnp.sum(jnp.square(im), axis=(1, 2, 3))
    got = float(r1_penalty_fn(disc, x))
    want = float(np.mean(np.sum((2 * np.asarray(x)) ** 2, axis=(1, 2, 3))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_path_regularize_stats():
    g = jnp.asarray(np.random.RandomState(3).randn(4, 18, 512).astype(np.float32))
    pen, mean_len, new_mean = path_regularize_stats(g, 0.0)
    lengths = np.sqrt((np.asarray(g) ** 2).sum(2).mean(1))
    want_mean = 0.0 + 0.01 * (lengths.mean() - 0.0)
    np.testing.assert_allclose(float(new_mean), want_mean, rtol=1e-5)
    np.testing.assert_allclose(float(pen), ((lengths - want_mean) ** 2).mean(),
                               rtol=1e-4)


def test_mask_loss():
    m = MaskLoss(loss_weight=2.0, loss_func={
        "binary": [8], "area": {"8": 0.25}, "target": 1, "binary_weight": 0.5})
    align = jnp.concatenate([jnp.zeros((1, 8, 8, 2)),
                             jnp.full((1, 8, 8, 1), 0.75)], axis=-1)
    l_bin, l_area = m({1: align})
    np.testing.assert_allclose(float(l_bin), 0.25 * 0.5 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(l_area), (0.75 - 0.25) * 2.0, rtol=1e-6)


def test_perceptual_loss_runs_and_styles():
    pl = PerceptualLoss(layer_weights={"conv1_2": 0.1, "conv2_2": 1.0},
                        range_norm=True, style_weight=50.0)
    rng = jax.random.PRNGKey(0)
    params = pl.init(rng, (1, 32, 32, 3))
    x = jax.random.normal(rng, (2, 32, 32, 3))
    gt = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    percep, style = pl(params, x, gt)
    assert np.isfinite(float(percep)) and float(percep) > 0
    assert np.isfinite(float(style)) and float(style) > 0
    p0, s0 = pl(params, gt, gt)
    assert float(p0) < 1e-6 and float(s0) < 1e-6


def test_id_loss_mimo_and_single():
    idl = IDLoss(loss_weight=0.1, ref_loss_weight=0.5)
    rng = jax.random.PRNGKey(0)
    params = idl.init(rng, image_size=112)
    x = jax.random.normal(rng, (2, 256, 256, 3))
    loss, ref = idl(params, x, x, x, mimo_id=False)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)  # same image
    xm = x.reshape(2, 1, 256, 256, 3)
    score = jnp.ones((2, 1))
    loss_m, ref_m = idl(params, xm, xm, xm, mimo_id=True, score=score)
    np.testing.assert_allclose(float(loss_m), 0.0, atol=1e-5)
    assert np.isfinite(float(ref_m))


def test_build_loss_registry():
    l = build_loss({"type": "MSELoss", "loss_weight": 2.0})
    assert isinstance(l, MSELoss)
    v = float(l(jnp.ones((2, 2)), jnp.zeros((2, 2))))
    np.testing.assert_allclose(v, 2.0)


def test_ranger_and_cosine_schedule():
    import optax
    from ood_gan_inversion_tpu.models.optim import (
        ranger, make_optimizer, cosine_annealing_restart_lr)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = ranger(1e-2, k=2)
    state = tx.init(params)
    p = params
    for i in range(4):
        # NOTE: constant grads are zeroed by gradient centralization (a
        # faithful Ranger behavior) -- use non-constant grads
        grads = {"w": jax.random.normal(jax.random.PRNGKey(i), (4, 4)),
                 "b": jnp.ones((4,))}
        upd, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, upd)
    assert float(jnp.abs(p["w"] - 1.0).max()) > 0  # moved
    assert np.isfinite(np.asarray(p["w"])).all()

    sch = cosine_annealing_restart_lr(1.0, periods=[10, 10],
                                      restart_weights=[1.0, 0.5])
    np.testing.assert_allclose(float(sch(0)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sch(10)), 0.5, atol=1e-6)  # restart
    assert float(sch(5)) < 1.0

    sgd = make_optimizer("SGD", 0.1, momentum=0.9)
    s = sgd.init(params)
    upd, _ = sgd.update(jax.tree_util.tree_map(jnp.ones_like, params), s, params)
    np.testing.assert_allclose(np.asarray(upd["w"])[0, 0], -0.1, rtol=1e-6)


def test_perceptual_loss_bf16_matches_fp32():
    """perceptual_opt.dtype: bfloat16 (the TPU train-step knob) must track
    the fp32 loss within bf16 tolerance, with grads flowing and the
    no-grad gt path (features/compare split) agreeing with __call__."""
    kw = dict(layer_weights={"conv1_2": 0.1, "conv2_2": 1.0},
              range_norm=True, style_weight=50.0)
    pl32 = PerceptualLoss(**kw)
    pl16 = PerceptualLoss(dtype="bfloat16", **kw)
    rng = jax.random.PRNGKey(0)
    params = pl32.init(rng, (1, 32, 32, 3))
    x = jax.random.normal(rng, (2, 32, 32, 3))
    gt = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    p32, s32 = pl32(params, x, gt)
    p16, s16 = pl16(params, x, gt)
    assert p16.dtype == jnp.float32  # reductions stay fp32
    np.testing.assert_allclose(float(p16), float(p32), rtol=0.05)
    np.testing.assert_allclose(float(s16), float(s32), rtol=0.08)

    # split API == __call__
    gf = pl16.features(params, gt)
    p2, s2 = pl16.compare(pl16.features(params, x), gf)
    np.testing.assert_allclose(float(p2), float(p16), rtol=1e-6)

    g = jax.grad(lambda xx: pl16(params, xx, gt)[0])(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
