"""GCFSR generator family + SFT/ADD/FUSE feature_modulation tests
(reference src/ops/StyleGAN/GCFSR_modules.py, model.py:588-609)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ood_gan_inversion_tpu.nn import (GCFSRGenerator, feature_modulation)


def test_gcfsr_decode_shapes_and_concat_width():
    gen = GCFSRGenerator(size=32, style_dim=32, n_mlp=2, channel_multiplier=1)
    rng = jax.random.PRNGKey(0)
    lats = jax.random.normal(rng, (2, 8, 32))
    params = gen.init({"params": rng, "noise": rng}, lats)
    img = gen.apply(params, lats, rngs={"noise": jax.random.PRNGKey(1)})
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_gcfsr_feature_blend_changes_output():
    gen = GCFSRGenerator(size=16, style_dim=16, n_mlp=1, channel_multiplier=1,
                         merge="concat_modulation")
    rng = jax.random.PRNGKey(0)
    lats = jax.random.normal(rng, (1, 6, 16))
    ch4 = gen.channels[4] if hasattr(gen, "channels") else 512
    # feats list: per-layer targets for FeatureModulation (2x width, concat)
    params = gen.init({"params": rng, "noise": rng}, lats)

    base = gen.apply(params, lats, rngs={"noise": jax.random.PRNGKey(1)})
    # sigma (1,2): blend all-source (identity-ish) vs shifted
    n_layers = (int(np.log2(16)) - 2) * 2 + 1
    feats = [None] * n_layers
    sigmas = [None] * n_layers
    feats[0] = jnp.ones((1, 4, 4, 1024), jnp.float32)  # 512*2 concat width
    sigmas[0] = jnp.asarray([[0.5, 0.5]], jnp.float32)
    out = gen.apply(params, lats, feats=feats, sigmas=sigmas,
                    rngs={"noise": jax.random.PRNGKey(1)})
    assert out.shape == base.shape
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_gcfsr_condition_injection_sft():
    gen = GCFSRGenerator(size=16, style_dim=16, n_mlp=1, channel_multiplier=1)
    rng = jax.random.PRNGKey(0)
    lats = jax.random.normal(rng, (1, 6, 16))
    params = gen.init({"params": rng, "noise": rng}, lats)
    base = gen.apply(params, lats, rngs={"noise": jax.random.PRNGKey(1)})
    # layer i=1 output after concat-noise has 512*2 channels at 8x8
    cond = (0.3 * jnp.ones((1, 8, 8, 1024)), 0.1 * jnp.ones((1, 8, 8, 1024)))
    out = gen.apply(params, lats, conditions=[cond], cond_ind=[1],
                    mod_type="SFT", rngs={"noise": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(out), np.asarray(base))


@pytest.mark.parametrize("mod_type", ["SFT", "ADD", "FUSE"])
def test_feature_modulation_semantics(mod_type):
    g = jnp.ones((1, 4, 4, 3))
    scale = 0.5 * jnp.ones_like(g)
    shift = 0.25 * jnp.ones_like(g)
    out = feature_modulation(g, (scale, shift), mod_type=mod_type)
    if mod_type == "SFT":
        expect = 1.0 * (1 + 0.5) + 0.25
    elif mod_type == "ADD":
        expect = 1.0 + 0.25
    else:  # FUSE
        expect = 1.0 + 0.25 * float(jax.nn.sigmoid(0.5))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_feature_modulation_unknown_type_raises():
    g = jnp.ones((1, 2, 2, 1))
    with pytest.raises(NotImplementedError):
        feature_modulation(g, (g, g), mod_type="nope")


def test_ood_arch_add_modulation_forward():
    """ADD-path SAMM injection through the full arch (reference
    model.py:560-566 ADD branch via callback)."""
    from ood_gan_inversion_tpu.archs import build_network
    net = build_network({
        "type": "ood_faceGAN_e4e", "out_size": 64,
        "channel_multiplier": 1, "encoder": "E4E",
        "enable_modulation": True, "modulation_type": "ADD",
        "warp_scale": 0.08, "cycle_align": 1, "blend_with_gen": True,
    })
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3)) * 0.5
    variables = net.init({"params": rng, "noise": rng}, x, mod_size=64)

    # ADD mode adds `aligned - gen + randn` (noise_weight defaults to 1 in
    # the reference callback, arch L233-242) — finite even at zero-init.
    out = net.apply({"params": variables["params"]}, x, mod_size=64,
                    rngs={"noise": jax.random.PRNGKey(1)})
    assert out["image"].shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out["image"])).all()
    assert out["mask"] is not None
