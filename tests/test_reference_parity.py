"""GOLDEN numeric parity against the ACTUAL reference implementation.

Unlike test_ops.py (independently re-written oracles), these tests run the
reference PyTorch modules from /root/reference on CPU, push their real
state_dicts through tools/convert_torch_weights.py, load the converted trees
into the flax twins, and assert output parity. This validates, in one shot:
the module math, the layout conventions (NCHW->NHWC, OIHW->HWIO), and the
converter mappings that real pretrained .pth files will travel through.

Noise protocol: all comparisons run with zero injected noise (explicit zero
noise lists / the zero_noise_injection patch from ref_compat) so both
programs are deterministic; noise WEIGHTS are randomized non-zero so the
reference's callback algebra (divide-by-weight, arch L224-242) is exercised.

Tolerances budget for the modulated-conv scaled-input rewrite (SURVEY §7
"hard parts": ~1e-6 relative per conv, compounding through 9-17 layers).
"""

import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from flax import traverse_util

sys.path.insert(0, "tests")
sys.path.insert(0, "tools")

from ref_compat import (load_reference_module, zero_noise_injection,
                        to_nhwc, from_nhwc)
from convert_torch_weights import (convert_stylegan2_generator,
                                   convert_stylegan2_discriminator,
                                   convert_e4e_encoder, convert_spm_warp,
                                   convert_ood_e4e_arch)


def perturb_state_dict(module, seed=0):
    """Randomize every float param/buffer so deterministic inits (zeros/ones
    norms, zero noise weights) don't mask converter mapping errors."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            continue
        if k.endswith("kernel") or "noises.noise" in k:
            continue            # FIR kernels are structural constants
        if "running_var" in k:
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif k.endswith("noise.weight") or "noiseInj" in k:
            sd[k] = 0.3 + torch.rand(v.shape, generator=g)
        elif (k.endswith(".weight")
              and k[:-len(".weight")] + ".running_mean" in sd):
            # BatchNorm scale: keep SMALL so activations stay O(1) through
            # the 24-block residual trunk (torch-default conv init otherwise
            # compounds to ~1e11 by block 24 and fp32 atol loses meaning)
            sd[k] = 0.05 + 0.25 * torch.rand(v.shape, generator=g)
        else:
            sd[k] = v + 0.05 * torch.randn(v.shape, generator=g)
    module.load_state_dict(sd)
    return module.state_dict()


def clean(flat):
    """Drop the leading '/' that empty-prefix converter calls produce."""
    return {(k[1:] if k.startswith("/") else k): v for k, v in flat.items()}


def unflatten(flat):
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})


def assert_tree_matches_init(converted_flat, init_params, prefix=""):
    """Converted key set and shapes must EXACTLY match a flax init tree."""
    init_flat = {"/".join(k): v for k, v in
                 traverse_util.flatten_dict(init_params).items()}
    missing = sorted(set(init_flat) - set(converted_flat))
    extra = sorted(set(converted_flat) - set(init_flat))
    assert not missing and not extra, (
        f"{prefix} converted/init mismatch\nmissing: {missing[:8]}\n"
        f"extra: {extra[:8]}")
    for k, v in converted_flat.items():
        assert tuple(v.shape) == tuple(init_flat[k].shape), (
            k, v.shape, init_flat[k].shape)


def zero_noise_lists(size, batch=1):
    """(torch list NCHW, jax list NHWC) of per-layer zero noise maps."""
    import math
    num_layers = (int(math.log2(size)) - 2) * 2 + 1
    tl, jl = [], []
    for i in range(num_layers):
        r = 2 ** ((i + 5) // 2)
        tl.append(torch.zeros(batch, 1, r, r))
        jl.append(jnp.zeros((batch, r, r, 1)))
    return tl, jl


# ------------------------------------------------------------------ generator

@pytest.mark.parametrize("size", [64, 512])
def test_generator_golden(size):
    """Reference rosinality Generator (src/ops/StyleGAN/model.py:375-585)
    vs flax Generator via the converter. size=512 also exercises the
    polyphase packed decode tail (>=512px stages)."""
    from ood_gan_inversion_tpu.nn import Generator

    m = load_reference_module("src.ops.StyleGAN.model")
    torch.manual_seed(0)
    ref = m.Generator(size=size, style_dim=64, n_mlp=2, channel_multiplier=1)
    sd = perturb_state_dict(ref, seed=1)

    flat, leftovers = convert_stylegan2_generator(sd, prefix="")
    assert not leftovers, leftovers
    flat = clean(flat)

    import math
    gen = Generator(size=size, style_dim=64, n_mlp=2, channel_multiplier=1)
    n_latent = int(math.log2(size)) * 2 - 2
    lat_np = np.random.RandomState(2).randn(2, n_latent, 64).astype(
        np.float32) * 0.7
    tl, jl = zero_noise_lists(size, batch=2)

    init = gen.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, jnp.asarray(lat_np),
                    method=Generator.init_stub)
    assert_tree_matches_init(flat, init["params"], "generator")
    params = unflatten(flat)

    with torch.no_grad():
        ref_img, _ = ref(torch.from_numpy(lat_np), input_is_tensor=True,
                         input_is_latent=True, noise=tl)
    img = gen.apply({"params": params}, jnp.asarray(lat_np), noise=jl)
    np.testing.assert_allclose(np.asarray(img), to_nhwc(ref_img),
                               atol=3e-3, rtol=0)

    # style MLP (model.py:391-400): pixel_norm + n_mlp EqualLinear lr_mul=.01
    z = np.random.RandomState(3).randn(4, 64).astype(np.float32)
    with torch.no_grad():
        ref_w = ref.style(torch.from_numpy(z))
    w = gen.apply({"params": params}, jnp.asarray(z),
                  method=Generator.style_mlp)
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=2e-5,
                               rtol=0)


# -------------------------------------------------------------- discriminator

def test_discriminator_golden():
    """BasicSR-style StyleGAN2Discriminator (stylegan2_arch.py:766-836, the
    net_d) vs flax Discriminator: score + both feature taps."""
    from ood_gan_inversion_tpu.nn.stylegan2 import Discriminator

    m = load_reference_module("src.ops.StyleGAN.stylegan2_arch")
    torch.manual_seed(0)
    ref = m.StyleGAN2Discriminator(out_size=64, channel_multiplier=1)
    sd = perturb_state_dict(ref, seed=4)
    flat, _ = convert_stylegan2_discriminator(sd, prefix="")
    flat = clean(flat)

    disc = Discriminator(size=64, channel_multiplier=1)
    x = np.random.RandomState(5).randn(4, 64, 64, 3).astype(np.float32)
    init = disc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert_tree_matches_init(flat, init["params"], "discriminator")
    params = unflatten(flat)

    with torch.no_grad():
        ref_out, ref_feats = ref(from_nhwc(x))
    out, feats = disc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-3,
                               rtol=0)
    assert len(feats) == len(ref_feats) == 2
    for f, rf in zip(feats, ref_feats):
        np.testing.assert_allclose(np.asarray(f), to_nhwc(rf), atol=2e-3,
                                   rtol=0)


# ----------------------------------------------------------------------- SAMM

@pytest.mark.parametrize("with_coarse", [False, True])
def test_spm_warp_golden(with_coarse):
    """SPM_Warp cycle-2 alignment (SAMM/helpers.py:111-179), with and
    without the cross-scale coarse merge."""
    from ood_gan_inversion_tpu.nn.samm import SPMWarp

    s = load_reference_module("src.ops.SAMM.helpers")
    torch.manual_seed(0)
    ref = s.SPM_Warp(in_chn=32, scale=0.08, cycle_align=2, diff_fAndg=True)
    sd = perturb_state_dict(ref, seed=6)
    flat, consumed = convert_spm_warp(sd)
    flat = clean(flat)
    assert set(sd) == consumed, sorted(set(sd) - consumed)

    warp = SPMWarp(in_ch=32, scale=0.08, cycle_align=2)
    rs = np.random.RandomState(7)
    source = rs.randn(2, 16, 16, 32).astype(np.float32)
    target = rs.randn(2, 16, 16, 32).astype(np.float32)
    coarse = (np.concatenate([
        np.clip(rs.randn(2, 8, 8, 2) * 0.03, -0.08, 0.08),
        rs.rand(2, 8, 8, 1)], axis=-1).astype(np.float32)
        if with_coarse else None)

    init = warp.init(jax.random.PRNGKey(0), jnp.asarray(source),
                     jnp.asarray(target),
                     None if coarse is None else jnp.asarray(coarse))
    assert_tree_matches_init(flat, init["params"], "spm_warp")
    params = unflatten(flat)

    with torch.no_grad():
        ref_at, ref_align = ref(from_nhwc(source), from_nhwc(target),
                                aligned=None if coarse is None
                                else from_nhwc(coarse))
    at, align = warp.apply({"params": params}, jnp.asarray(source),
                           jnp.asarray(target),
                           None if coarse is None else jnp.asarray(coarse))
    np.testing.assert_allclose(np.asarray(align), to_nhwc(ref_align),
                               atol=2e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(at), to_nhwc(ref_at), atol=2e-4,
                               rtol=0)


# ---------------------------------------------------------------- E4E encoder

def test_e4e_encoder_golden():
    """Encoder4Editing (psp_encoders.py:125-216): W+ latents and the 4
    feature taps the SAMM adapters consume."""
    import easydict
    from ood_gan_inversion_tpu.nn.encoders.e4e import Encoder4Editing

    p = load_reference_module("src.ops.e4e.encoders.psp_encoders")
    torch.manual_seed(0)
    opts = easydict.EasyDict()
    opts.stylegan_size = 256
    ref = p.Encoder4Editing(num_layers=50, mode="ir_se", opts=opts, bn=True)
    ref.eval()
    sd = perturb_state_dict(ref, seed=8)

    flat, leftovers = convert_e4e_encoder(sd, prefix="")
    assert not leftovers, leftovers
    flat = clean(flat)

    enc = Encoder4Editing(num_layers=50, mode="ir_se", stylegan_size=256,
                          bn=True)
    x = (np.random.RandomState(9).rand(1, 256, 256, 3).astype(np.float32)
         * 2 - 1)
    init = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert_tree_matches_init(flat, init["params"], "e4e")
    params = unflatten(flat)

    with torch.no_grad():
        ref_w, ref_feats = ref(from_nhwc(x), return_feats=True)
    w, feats = enc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=2e-3,
                               rtol=0)
    assert len(feats) == len(ref_feats) == 5
    for f, rf in zip(feats[:4], ref_feats[:4]):
        np.testing.assert_allclose(np.asarray(f), to_nhwc(rf), atol=2e-3,
                                   rtol=0)


# ------------------------------------------------------------------ full arch

def test_full_arch_golden():
    """End-to-end ood_faceGAN_e4e forward (OOD_faceGAN_e4e_arch.py:245-313):
    encode -> W+ math -> SAMM-conditioned decode (NOISE callback protocol)
    -> mask composite -> OOD blend, zero-noise deterministic, full converted
    state_dict. This is the single test that pins the whole inversion
    pipeline to the reference program."""
    from ood_gan_inversion_tpu.archs.ood_e4e import OODFaceGANE4E

    a = load_reference_module("src.archs.OOD_faceGAN_e4e_arch")
    torch.manual_seed(0)
    ref = a.ood_faceGAN_e4e(
        out_size=256, style_dim=512, n_mlp=2, channel_multiplier=1,
        encoder="E4E", enable_modulation=True, modulation_type="NOISE",
        warp_scale=0.08, cycle_align=2, blend_with_gen=True,
        stage="Inference", ModSize=256)
    # reference hardcodes delta_latent at 18 styles (arch L129); resize for
    # the 256px style count the same way delta_latent_pth loading would
    ref.delta_latent = torch.nn.Parameter(
        torch.zeros(1, ref.style_cnt, 512), requires_grad=False)
    ref.eval()
    sd = perturb_state_dict(ref, seed=10)

    flat, leftovers = convert_ood_e4e_arch(sd)
    assert not leftovers, leftovers
    # the arch forward feeds W+ directly, so its init tree has no style-MLP
    # params; the converted tree legitimately carries them (random_latents)
    flat = {k: v for k, v in flat.items()
            if not k.startswith("generator/style_")}

    net = OODFaceGANE4E(out_size=256, style_dim=512, n_mlp=2,
                        channel_multiplier=1, encoder="E4E",
                        enable_modulation=True, modulation_type="NOISE",
                        warp_scale=0.08, cycle_align=2, blend_with_gen=True)
    x = (np.random.RandomState(11).rand(1, 256, 256, 3).astype(np.float32)
         * 2 - 1)
    _, jl = zero_noise_lists(256, batch=1)
    init = net.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                    mod_size=256, noise=jl)
    assert_tree_matches_init(flat, init["params"], "ood_e4e")
    params = unflatten(flat)

    with zero_noise_injection():
        with torch.no_grad():
            ref_out, ref_lats = ref(from_nhwc(x))
    out = net.apply({"params": params}, jnp.asarray(x), mod_size=256,
                    noise=jl)

    np.testing.assert_allclose(np.asarray(out["lats"]), ref_lats.numpy(),
                               atol=2e-3, rtol=0)
    # per-scale aligns (the invertibility masks)
    for ind in (1, 2, 3, 4):
        np.testing.assert_allclose(np.asarray(out["aligns"][ind]),
                                   to_nhwc(ref.aligns[ind]), atol=3e-3,
                                   rtol=0)
    np.testing.assert_allclose(np.asarray(out["mask"]),
                               to_nhwc(ref.aligns[1024])[..., :1], atol=3e-3,
                               rtol=0)
    np.testing.assert_allclose(np.asarray(out["image"]), to_nhwc(ref_out),
                               atol=6e-3, rtol=0)
