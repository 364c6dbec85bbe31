"""Forward tests for the ReStyle and FeatureStyle arch families (tiny
configs), mirroring the E4E arch tests."""

import numpy as np
import jax
import jax.numpy as jnp

from ood_gan_inversion_tpu.archs import build_network


def test_restyle_forward():
    arch = build_network({"type": "ood_faceGAN_restyle", "out_size": 64,
                          "channel_multiplier": 1, "enc_cycle": 2,
                          "cycle_align": 1, "warp_scale": 0.08})
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    params = arch.init({"params": rng, "noise": rng}, x, mod_size=64)
    out = arch.apply(params, x, mod_size=64,
                     rngs={"noise": jax.random.PRNGKey(1)})
    assert out["image"].shape == (1, 64, 64, 3)
    assert sorted(k for k in out["aligns"] if k <= 4) == [1, 2]
    assert np.isfinite(np.asarray(out["image"])).all()
    # avg_latent is per-layer for restyle
    assert params["params"]["avg_latent"].shape == (10, 512)


def test_featurestyle_forward_with_content_injection():
    # inject_content=True opts into the injection the reference WIRES but
    # never actually passes on its forward path (dead code there — see the
    # arch attribute docstring); default False matches the reference
    arch = build_network({"type": "ood_faceGAN_FeatureStyle", "out_size": 64,
                          "channel_multiplier": 1, "cycle_align": 1,
                          "warp_scale": 0.08, "inject_content": True})
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    params = arch.init({"params": rng, "noise": rng}, x, mod_size=64)
    out = arch.apply(params, x, mod_size=64,
                     rngs={"noise": jax.random.PRNGKey(1)})
    assert out["image"].shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out["image"])).all()

    # content injection must matter: replace the content path's final BN scale
    # with zeros -> different image
    p2 = jax.tree_util.tree_map(lambda v: v, params)
    import flax
    flat = flax.traverse_util.flatten_dict(p2, sep="/")
    key = "params/encoder/content_bn2/scale"
    flat[key] = jnp.zeros_like(flat[key])
    p2 = flax.traverse_util.unflatten_dict(flat, sep="/")
    out2 = arch.apply(p2, x, mod_size=64, rngs={"noise": jax.random.PRNGKey(1)})
    assert np.abs(np.asarray(out2["gen_image"]) -
                  np.asarray(out["gen_image"])).max() > 1e-4


def test_featurestyle_encoder_shapes():
    from ood_gan_inversion_tpu.nn.encoders.feature_style import FSEncoderV2
    enc = FSEncoderV2(n_styles=18)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 256, 256, 3))
    params = enc.init(rng, x)
    lats, content, feats = enc.apply(params, x)
    assert lats.shape == (1, 18, 512)
    assert content.shape == (1, 16, 16, 512)
    assert [f.shape for f in feats] == [(1, 256, 256, 64), (1, 128, 128, 64),
                                        (1, 64, 64, 128), (1, 32, 32, 256)]
