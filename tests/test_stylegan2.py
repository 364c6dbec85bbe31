"""Generator / discriminator shape+sanity tests on tiny configs (the
reference framework's arch-test pattern, BasicSR/tests/test_archs/*, but
runnable on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from ood_gan_inversion_tpu.nn import Generator, Discriminator


def test_generator_decode_shapes():
    gen = Generator(size=64, style_dim=64, n_mlp=2, channel_multiplier=1)
    rng = jax.random.PRNGKey(0)
    n_latent = 2 * 6 - 2  # log2(64)=6
    lats = jax.random.normal(rng, (2, n_latent, 64))
    params = gen.init({"params": rng, "noise": rng}, lats)
    img = gen.apply(params, lats, rngs={"noise": jax.random.PRNGKey(1)})
    assert img.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_generator_style_mlp():
    gen = Generator(size=32, style_dim=32, n_mlp=2, channel_multiplier=1)
    rng = jax.random.PRNGKey(0)
    lats = jnp.zeros((1, 8, 32))
    params = gen.init({"params": rng, "noise": rng}, lats,
                      method=Generator.init_stub)
    z = jax.random.normal(rng, (4, 32))
    w = gen.apply(params, z, method=Generator.style_mlp)
    assert w.shape == (4, 32)


def test_generator_jit_and_noise_determinism():
    gen = Generator(size=32, style_dim=32, n_mlp=2, channel_multiplier=1)
    rng = jax.random.PRNGKey(0)
    lats = jax.random.normal(rng, (1, 8, 32))
    params = gen.init({"params": rng, "noise": rng}, lats)
    # noise weights init to 0 (reference model.py:281); bump one so the
    # noise stream is observable.
    params = jax.tree_util.tree_map(lambda x: x, params)
    import flax
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    for k in flat:
        if k.endswith("noise/weight"):
            flat[k] = jnp.ones_like(flat[k])
    params = flax.traverse_util.unflatten_dict(flat, sep="/")
    f = jax.jit(lambda p, l, k: gen.apply(p, l, rngs={"noise": k}))
    a = f(params, lats, jax.random.PRNGKey(7))
    b = f(params, lats, jax.random.PRNGKey(7))
    c = f(params, lats, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_discriminator_shapes_and_features():
    disc = Discriminator(size=64, channel_multiplier=1)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 64, 64, 3))
    params = disc.init(rng, x)
    score, feats = disc.apply(params, x)
    assert score.shape == (4, 1)
    assert len(feats) == 2
    assert feats[0].shape == (4, 4, 4, 512)   # body output at 4x4
    assert feats[1].shape == (4, 4, 4, 512)   # final conv output
    assert np.isfinite(np.asarray(score)).all()


def test_gpen_generator_concat_noise():
    from ood_gan_inversion_tpu.nn.stylegan2_gpen import GPENGenerator
    gen = GPENGenerator(size=32, style_dim=32, n_mlp=2, channel_multiplier=1,
                        narrow=0.5)
    rng = jax.random.PRNGKey(0)
    lats = jax.random.normal(rng, (2, 8, 32))
    params = gen.init({"params": rng, "noise": rng}, lats)
    img = gen.apply(params, lats, rngs={"noise": jax.random.PRNGKey(1)})
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
