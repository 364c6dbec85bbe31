"""GOLDEN parity for the secondary generator families against the ACTUAL
reference modules: the GPEN-variant StyleGAN2 (concat-noise,
src/ops/StyleGAN/modules.py:379-580) and GCFSR
(src/ops/StyleGAN/GCFSR_modules.py). Neither is instantiated by a shipped
OOD config, but both are part of the reference inventory (SURVEY §2.1);
these tests pin the flax rebuilds and the converter paths to the reference
programs themselves.
"""

import math
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
sys.path.insert(0, "tools")

from ref_compat import load_reference_module, to_nhwc, from_nhwc
from convert_torch_weights import (convert_stylegan2_generator,
                                   convert_gcfsr_generator,
                                   convert_latent_discriminator)
from test_reference_parity import (perturb_state_dict, clean, unflatten,
                                   assert_tree_matches_init)


def _zero_noise_gpen(size, channels, batch=1):
    """Per-layer FULL-CHANNEL zero noise (modules.py:515-521 draws
    (b, C_out, res, res) when none is given): (torch NCHW, jax NHWC)."""
    log_size = int(math.log2(size))
    shapes = [(channels[4], 4)]
    for i in range(3, log_size + 1):
        shapes += [(channels[2 ** i], 2 ** i)] * 2
    tl = [torch.zeros(batch, c, r, r) for c, r in shapes]
    jl = [jnp.zeros((batch, r, r, c)) for c, r in shapes]
    return tl, jl


def test_gpen_generator_golden():
    """GPENGenerator vs modules.py Generator (isconcat=True): the concat
    NoiseInjection doubles the width feeding every next conv, so any
    layout slip breaks loudly. Zero noise, W+ latent input."""
    from ood_gan_inversion_tpu.nn.stylegan2_gpen import GPENGenerator

    m = load_reference_module("src.ops.StyleGAN.modules")
    torch.manual_seed(3)
    size, style_dim = 64, 64
    ref = m.Generator(size, style_dim, n_mlp=2, channel_multiplier=1,
                      narrow=0.25)
    ref.eval()
    sd = perturb_state_dict(ref, seed=21)

    flat, leftovers = convert_stylegan2_generator(sd, prefix="")
    assert not leftovers, leftovers
    flat = clean(flat)

    gen = GPENGenerator(size=size, style_dim=style_dim, n_mlp=2,
                        channel_multiplier=1, narrow=0.25)
    n_latent = int(math.log2(size)) * 2 - 2
    lat = np.random.RandomState(7).randn(2, n_latent, style_dim).astype(
        np.float32) * 0.5
    tl, jl = _zero_noise_gpen(size, ref.channels, batch=2)
    # touch the style MLP too so its (lazily created) params are in the tree
    init = gen.init(
        {"params": jax.random.PRNGKey(0)},
        method=lambda m: (m(jnp.asarray(lat), noise=jl),
                          m.style_mlp(jnp.zeros((1, style_dim)))))
    assert_tree_matches_init(flat, init["params"], "gpen")
    params = unflatten(flat)

    with torch.no_grad():
        ref_img, _ = ref(torch.from_numpy(lat), input_is_latent=True,
                         styles_as_tensors=True, noise=tl)
    img = gen.apply({"params": params}, jnp.asarray(lat), noise=jl)
    np.testing.assert_allclose(np.asarray(img),
                               ref_img.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=0)

    # the style MLP (PixelNorm + 2 fused-lrelu EqualLinears) via get_latent
    z = np.random.RandomState(8).randn(3, style_dim).astype(np.float32)
    with torch.no_grad():
        ref_w = ref.get_latent(torch.from_numpy(z)).numpy()
    w = gen.apply({"params": params}, jnp.asarray(z), method=gen.style_mlp)
    np.testing.assert_allclose(np.asarray(w), ref_w, atol=1e-5, rtol=0)


def test_gcfsr_generator_golden():
    """GCFSRGenerator vs Generator_GCFSR (merge='concat_modulation'):
    plain decode, per-layer FeatureModulation sigma-blending, and SFT
    condition injection at an explicit cond_ind layer — all three against
    the reference program with one converted state_dict."""
    from ood_gan_inversion_tpu.nn.gcfsr import GCFSRGenerator

    m = load_reference_module("src.ops.StyleGAN.GCFSR_modules")
    torch.manual_seed(4)
    size, style_dim = 32, 32
    ref = m.Generator_GCFSR(size, style_dim, n_mlp=2, channel_multiplier=1,
                            merge="concat_modulation", narrow=0.25)
    ref.eval()
    sd = perturb_state_dict(ref, seed=22)

    flat, leftovers = convert_gcfsr_generator(sd, prefix="")
    assert not leftovers, leftovers
    flat = clean(flat)

    gen = GCFSRGenerator(size=size, style_dim=style_dim, n_mlp=2,
                         channel_multiplier=1, narrow=0.25,
                         merge="concat_modulation")
    n_latent = int(math.log2(size)) * 2 - 2   # 8
    num_layers = (int(math.log2(size)) - 2) * 2 + 1   # 7
    rs = np.random.RandomState(9)
    lat = rs.randn(2, n_latent, style_dim).astype(np.float32) * 0.5
    tl, jl = _zero_noise_gpen(size, ref.channels, batch=2)

    init = gen.init(
        {"params": jax.random.PRNGKey(0)},
        method=lambda g: (g(jnp.asarray(lat), noise=jl),
                          g.style_mlp(jnp.zeros((1, style_dim)))))
    assert_tree_matches_init(flat, init["params"], "gcfsr")
    params = unflatten(flat)

    def run_ref(**kw):
        with torch.no_grad():
            img, _ = ref(torch.from_numpy(lat), input_is_latent=True,
                         styles_as_tensors=True,
                         noise=[t.clone() for t in tl], **kw)
        return img.permute(0, 2, 3, 1).numpy()

    # 1. plain decode (feat_mod is identity without feats)
    img = gen.apply({"params": params}, jnp.asarray(lat), noise=jl)
    np.testing.assert_allclose(np.asarray(img), run_ref(), atol=1e-4, rtol=0)

    # 2. sigma-blend: feed a feature into the 8px conv pair. The reference
    #    zips feats[1::2] for BOTH convs of a pair (GCFSR_modules.py:612-614)
    #    and our module reproduces that, so one feat slot drives two convs;
    #    sigmas are per-conv.
    c8 = ref.channels[8] * 2        # concat width after the 8px convs
    feat_np = rs.randn(2, 8, 8, c8).astype(np.float32)
    sig1 = rs.rand(2, 2).astype(np.float32)
    sig2 = rs.rand(2, 2).astype(np.float32)
    feats_j = [None] * num_layers
    sigmas_j = [None] * num_layers
    feats_j[1] = jnp.asarray(feat_np)
    sigmas_j[1], sigmas_j[2] = jnp.asarray(sig1), jnp.asarray(sig2)
    feats_t = [None] * (num_layers + 1)     # ref list carries a head slot
    sigma_t = [None] * num_layers
    feats_t[2] = from_nhwc(feat_np)
    sigma_t[1] = torch.from_numpy(sig1)
    sigma_t[2] = torch.from_numpy(sig2)
    img = gen.apply({"params": params}, jnp.asarray(lat), noise=jl,
                    feats=feats_j, sigmas=sigmas_j)
    np.testing.assert_allclose(np.asarray(img),
                               run_ref(feats=feats_t, sigma=sigma_t),
                               atol=1e-4, rtol=0)

    # 3. SFT condition injection at layer i=3 (the 16px pair's first conv)
    c16 = ref.channels[16] * 2
    scale_np = 0.3 * rs.randn(2, 16, 16, c16).astype(np.float32)
    shift_np = 0.3 * rs.randn(2, 16, 16, c16).astype(np.float32)
    img = gen.apply({"params": params}, jnp.asarray(lat), noise=jl,
                    conditions=[(jnp.asarray(scale_np),
                                 jnp.asarray(shift_np))],
                    cond_ind=[3], mod_type="SFT")
    ref_img = run_ref(condition=[[from_nhwc(scale_np), from_nhwc(shift_np)]],
                      cond_ind=[3], mod_type="SFT")
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=1e-4, rtol=0)


def test_latent_discriminator_golden():
    """LatentDiscrinimator (Discriminator_arch.py:28-47): the W+ latent
    critic of the 3-optimizer GAN step. hidden_chn=1 as the shipped configs
    set it (options/train/E4E_Face.yml network_d_latent)."""
    from ood_gan_inversion_tpu.archs.discriminators import LatentDiscriminator

    m = load_reference_module("src.archs.Discriminator_arch")
    torch.manual_seed(5)
    ref = m.LatentDiscrinimator(chn=18, dim=64, n_mlp=3, hidden_chn=1)
    ref.eval()
    sd = perturb_state_dict(ref, seed=23)

    flat, leftovers = convert_latent_discriminator(sd)
    assert not leftovers, leftovers
    flat = clean(flat)

    d = LatentDiscriminator(chn=18, dim=64, n_mlp=3, hidden_chn=1)
    w = np.random.RandomState(10).randn(4, 18, 64).astype(np.float32)
    init = d.init(jax.random.PRNGKey(0), jnp.asarray(w))
    assert_tree_matches_init(flat, init["params"], "latent_d")
    params = unflatten(flat)

    with torch.no_grad():
        ref_score, _ = ref(torch.from_numpy(w))
    score, _ = d.apply({"params": params}, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(score), ref_score.numpy(),
                               atol=1e-5, rtol=0)
