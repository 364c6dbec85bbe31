"""End-to-end forward tests for the flagship OOD E4E arch on a tiny config
(out_size=64), exercising the SAMM-conditioned decode, mask compositing, and
blending, plus the encoder in isolation."""

import numpy as np
import jax
import jax.numpy as jnp

from ood_gan_inversion_tpu.archs import OODFaceGANE4E, build_network
from ood_gan_inversion_tpu.nn.encoders.e4e import Encoder4Editing


def tiny_arch(**kw):
    kw.setdefault("out_size", 64)
    kw.setdefault("channel_multiplier", 1)
    kw.setdefault("cycle_align", 2)
    kw.setdefault("warp_scale", 0.08)
    return OODFaceGANE4E(**kw)


def test_encoder_shapes():
    enc = Encoder4Editing(num_layers=50, mode="ir_se", stylegan_size=64)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 256, 256, 3))
    params = enc.init(rng, x)
    w, feats = enc.apply(params, x)
    assert w.shape == (1, 10, 512)      # 2*log2(64)-2 = 10
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 256, 256, 64), (1, 128, 128, 64), (1, 64, 64, 128),
                      (1, 32, 32, 256), (1, 16, 16, 512)]


def test_arch_forward_full():
    arch = tiny_arch()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    params = arch.init({"params": rng, "noise": rng}, x, mod_size=64)
    out = arch.apply(params, x, mod_size=64,
                     rngs={"noise": jax.random.PRNGKey(1)})
    assert out["image"].shape == (1, 64, 64, 3)
    assert out["mask"].shape == (1, 64, 64, 1)
    # mod_size=64 with a 32px floor -> 2 SAMM scales (layers 5, 7)
    assert sorted(k for k in out["aligns"] if k <= 4) == [1, 2]
    assert out["aligns"][1].shape == (1, 32, 32, 3)   # upsample conv out @32
    assert out["aligns"][2].shape == (1, 64, 64, 3)
    assert 64 in out["aligns"] and out["aligns"][64].shape == (1, 64, 64, 3)
    a = np.asarray(out["mask"])
    assert (a >= 0).all() and (a <= 1).all()
    assert np.isfinite(np.asarray(out["image"])).all()


def test_arch_forward_no_modulation():
    arch = tiny_arch(enable_modulation=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    params = arch.init({"params": rng, "noise": rng}, x, mod_size=0)
    out = arch.apply(params, x, mod_size=0,
                     rngs={"noise": jax.random.PRNGKey(1)})
    assert out["image"].shape == (1, 64, 64, 3)
    assert out["aligns"] == {}


def test_arch_progressive_mod_sizes():
    arch = tiny_arch()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    params = arch.init({"params": rng, "noise": rng}, x, mod_size=64)
    out32 = arch.apply(params, x, mod_size=32,
                       rngs={"noise": jax.random.PRNGKey(1)})
    assert sorted(k for k in out32["aligns"] if k <= 4) == [1]


def test_arch_jit_gradient_flows_to_samm_only_targets():
    """Gradients must reach modulation + feats_conv but not the (stop-grad)
    encoder trunk through the feature path."""
    arch = tiny_arch()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    params = arch.init({"params": rng, "noise": rng}, x, mod_size=64)

    def loss_fn(p):
        out = arch.apply(p, x, mod_size=64, rngs={"noise": jax.random.PRNGKey(1)})
        return jnp.mean(jnp.square(out["image"] - x))

    g = jax.grad(loss_fn)(params)
    gp = g["params"]
    mod_norm = sum(float(jnp.sum(jnp.abs(l)))
                   for l in jax.tree_util.tree_leaves(gp["modulation_3"]))
    fc_norm = sum(float(jnp.sum(jnp.abs(l)))
                  for l in jax.tree_util.tree_leaves(gp["feats_conv_3"]))
    enc_norm = sum(float(jnp.sum(jnp.abs(l)))
                   for l in jax.tree_util.tree_leaves(gp["encoder"]))
    assert mod_norm > 0
    assert fc_norm > 0
    assert enc_norm == 0


def test_build_network_registry():
    net = build_network({"type": "ood_faceGAN_e4e", "out_size": 64,
                         "channel_multiplier": 1})
    assert isinstance(net, OODFaceGANE4E)


def test_discriminators_registry():
    net_d = build_network({"type": "StyleGAN2Discriminator_mod",
                           "out_size": 64, "channel_multiplier": 1})
    net_d2 = build_network({"type": "LatentDiscrinimator", "chn": 10,
                            "dim": 64, "n_mlp": 2, "hidden_chn": 4})
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 64, 3))
    p = net_d.init(rng, x)
    score, feats = net_d.apply(p, x)
    assert score.shape == (2, 1) and len(feats) == 2
    lats = jax.random.normal(rng, (2, 10, 64))
    p2 = net_d2.init(rng, lats)
    s2, _ = net_d2.apply(p2, lats)
    assert s2.shape == (2, 1)


def test_arch_skip_sa():
    """skip_SA: blended base is a detached plain decode, masks still flow."""
    arch = tiny_arch(skip_SA=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    params = arch.init({"params": rng, "noise": rng}, x, mod_size=64)
    out = arch.apply(params, x, mod_size=64,
                     rngs={"noise": jax.random.PRNGKey(1)})
    assert out["mask"] is not None
    assert sorted(k for k in out["aligns"] if k <= 4) == [1, 2]

    def loss_fn(p):
        o = arch.apply(p, x, mod_size=64, rngs={"noise": jax.random.PRNGKey(1)})
        return jnp.mean(jnp.square(o["image"]))

    g = jax.grad(loss_fn)(params)["params"]
    # gradient still reaches SAMM through the mask path
    mod_norm = sum(float(jnp.sum(jnp.abs(l)))
                   for l in jax.tree_util.tree_leaves(g["modulation_3"]))
    assert mod_norm > 0


def test_arch_narrow_channels_consistent():
    """Regression (round 3): `narrow` must reach the Generator too — the
    arch previously narrowed the adapters/SAMM channel table but built the
    generator at narrow=1, so enable_modulation at narrow!=1 died on a
    feature-channel mismatch inside the first conditioned stage."""
    arch = tiny_arch(narrow=0.5, encoder_num_layers=4, n_mlp=2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    shapes = jax.eval_shape(
        lambda: arch.init({"params": rng, "noise": rng}, x, mod_size=64))
    assert shapes  # trace succeeds; channels agree across gen/SAMM/adapters


def test_encoder_grouped_matches_sequential(monkeypatch):
    """styles_grouped (round-4 grouped style-head evaluation) must be exact
    vs the sequential per-block loop: same param tree, same outputs."""
    import ood_gan_inversion_tpu.nn.encoders.e4e as e4e_mod
    enc = Encoder4Editing(num_layers=4, mode="ir_se", stylegan_size=1024)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 256, 3)) * 0.4
    params = enc.init(rng, x)
    monkeypatch.setattr(e4e_mod, "_E4E_GROUPED", True)
    w_g, feats_g = enc.apply(params, x)
    monkeypatch.setattr(e4e_mod, "_E4E_GROUPED", False)
    w_s, feats_s = enc.apply(params, x)
    assert w_g.shape == (2, 18, 512)
    np.testing.assert_allclose(np.asarray(w_g), np.asarray(w_s),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(feats_g, feats_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-Inference progressive stage keeps the sequential path and the two
    # flags still agree (grouped path only gates on the full-stage case)
    monkeypatch.setattr(e4e_mod, "_E4E_GROUPED", True)
    w_g5, _ = enc.apply(params, x, stage=5)
    monkeypatch.setattr(e4e_mod, "_E4E_GROUPED", False)
    w_s5, _ = enc.apply(params, x, stage=5)
    np.testing.assert_allclose(np.asarray(w_g5), np.asarray(w_s5),
                               rtol=2e-5, atol=2e-5)


def test_restyle_encoder_grouped_matches_sequential(monkeypatch):
    import ood_gan_inversion_tpu.nn.encoders.e4e as e4e_mod
    import ood_gan_inversion_tpu.nn.encoders.restyle as restyle_mod
    from ood_gan_inversion_tpu.nn.encoders.restyle import (
        ProgressiveBackboneEncoder)
    enc = ProgressiveBackboneEncoder(num_layers=4, n_styles=18)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 6)) * 0.4
    params = enc.init(rng, x)
    monkeypatch.setattr(restyle_mod, "_E4E_GROUPED", True)
    w_g, _ = enc.apply(params, x)
    monkeypatch.setattr(restyle_mod, "_E4E_GROUPED", False)
    w_s, _ = enc.apply(params, x)
    np.testing.assert_allclose(np.asarray(w_g), np.asarray(w_s),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inference_island_matches_fp32_island():
    """r4 default flip (OGI_SAMM_FP32_INFER=0): at inference a bf16 arch
    runs SAMM in bf16 (PERF.md r4 battery 3: 22.8 vs 25.4 ms/img). The
    fp32 island stays available (flag) and for training. This pins the
    numeric drift of the bf16 island against the fp32-island formulation,
    with the warp grid kept fp32 either way (nn/samm.py gdt guard)."""
    from ood_gan_inversion_tpu.archs import common as arch_common

    arch = tiny_arch(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    params = arch.init({"params": rng, "noise": rng}, x, mod_size=64)
    noise_key = jax.random.PRNGKey(1)

    orig = arch_common._SAMM_FP32_INFER
    try:
        arch_common._SAMM_FP32_INFER = True
        ref = arch.apply(params, x, mod_size=64, rngs={"noise": noise_key})
        arch_common._SAMM_FP32_INFER = False
        out = arch.apply(params, x, mod_size=64, rngs={"noise": noise_key})
    finally:
        arch_common._SAMM_FP32_INFER = orig

    a = np.asarray(ref["image"], np.float32)
    b = np.asarray(out["image"], np.float32)
    rng_span = float(a.max() - a.min()) or 1.0
    rel = float(np.max(np.abs(a - b))) / rng_span
    assert rel < 0.02, rel
    am = np.asarray(ref["mask"], np.float32)
    bm = np.asarray(out["mask"], np.float32)
    assert float(np.max(np.abs(am - bm))) < 0.02


def test_train_flag_does_not_change_values():
    """conditioned_decode(train=True) only wraps stages in remat — values
    must be identical to the inference path."""
    arch = tiny_arch()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    params = arch.init({"params": rng, "noise": rng}, x, mod_size=64)
    k = jax.random.PRNGKey(1)
    o_inf = arch.apply(params, x, mod_size=64, rngs={"noise": k})
    o_tr = arch.apply(params, x, mod_size=64, train=True,
                      rngs={"noise": k})
    np.testing.assert_allclose(np.asarray(o_inf["image"]),
                               np.asarray(o_tr["image"]), rtol=0, atol=1e-6)
