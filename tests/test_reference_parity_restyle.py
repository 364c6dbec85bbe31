"""GOLDEN parity for the ReStyle family against the ACTUAL reference
(src/archs/OOD_faceGAN_restyle_arch.py, src/ops/restyle/
restyle_e4e_encoder.py) — same protocol as test_reference_parity.py:
run the torch modules with randomized state, convert the real state_dict,
assert output parity under the zero-noise deterministic protocol."""

import contextlib
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
sys.path.insert(0, "tools")

from ref_compat import (load_reference_module, zero_noise_injection,
                        to_nhwc, from_nhwc)
from convert_torch_weights import (convert_restyle_encoder,
                                   convert_ood_restyle_arch)
from test_reference_parity import (perturb_state_dict, unflatten,
                                   assert_tree_matches_init)


@contextlib.contextmanager
def jax_zero_noise():
    """Mirror of ref_compat.zero_noise_injection for the flax side: draw
    ZERO noise when none is supplied (deterministic, no 'noise' rng)."""
    from ood_gan_inversion_tpu.nn import stylegan2 as sg
    orig = sg.NoiseInjection.__call__

    def call(self, image, noise=None):
        if noise is None:
            noise = jnp.zeros(image.shape[:3] + (1,), image.dtype)
        return image + self.weight.astype(image.dtype) * noise

    sg.NoiseInjection.__call__ = call
    try:
        yield
    finally:
        sg.NoiseInjection.__call__ = orig


def test_restyle_encoder_golden():
    """ProgressiveBackboneEncoder (6-ch input, all styles from the final
    16x16 map) vs restyle_e4e_encoder.py:35-110 with converted weights."""
    from ood_gan_inversion_tpu.nn.encoders.restyle import (
        ProgressiveBackboneEncoder)

    m = load_reference_module("src.ops.restyle.restyle_e4e_encoder")
    import easydict
    torch.manual_seed(0)
    ref = m.ProgressiveBackboneEncoder(
        num_layers=50, mode="ir_se", n_styles=12,
        opts=easydict.EasyDict(input_nc=6))
    ref.eval()
    sd = perturb_state_dict(ref, seed=20)

    flat, leftovers = convert_restyle_encoder(sd, prefix="")
    assert not leftovers, leftovers
    flat = {k.lstrip("/"): v for k, v in flat.items()}

    net = ProgressiveBackboneEncoder(num_layers=50, mode="ir_se",
                                     n_styles=12, input_nc=6)
    x = (np.random.RandomState(21).rand(2, 256, 256, 6)
         .astype(np.float32) * 2 - 1)
    init = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert_tree_matches_init(flat, init["params"], "restyle_enc")
    params = unflatten(flat)

    with torch.no_grad():
        ref_w, ref_feats = ref(from_nhwc(x), return_feats=True)
    w, feats = net.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=2e-3,
                               rtol=0)
    assert len(feats) == len(ref_feats)
    for f, rf in zip(feats, ref_feats):
        np.testing.assert_allclose(np.asarray(f), to_nhwc(rf), atol=2e-3,
                                   rtol=0)


def test_full_restyle_arch_golden(tmp_path):
    """End-to-end ood_faceGAN_restyle forward
    (OOD_faceGAN_restyle_arch.py:297-339): avg-image decode -> enc_cycle
    refinement -> per-layer avg_latent math -> SAMM decode -> blend, full
    converted state_dict, zero-noise deterministic. The reference
    constructor insists on loading the encoder from a ReStyle_pth bundle
    (arch L68-84), so the test fabricates one."""
    from ood_gan_inversion_tpu.archs.ood_restyle import OODFaceGANReStyle

    a = load_reference_module("src.archs.OOD_faceGAN_restyle_arch")
    m = load_reference_module("src.ops.restyle.restyle_e4e_encoder")
    import easydict
    torch.manual_seed(0)
    style_cnt = 14  # 256px
    enc = m.ProgressiveBackboneEncoder(
        num_layers=50, mode="ir_se", n_styles=style_cnt,
        opts=easydict.EasyDict(input_nc=6))
    bundle = {
        "latent_avg": 0.1 * torch.randn(style_cnt, 512),
        "opts": {"encoder_type": "ProgressiveBackboneEncoder",
                 "input_nc": 6},
        "state_dict": {f"encoder.{k}": v
                       for k, v in enc.state_dict().items()},
    }
    pth = str(tmp_path / "restyle.pt")
    torch.save(bundle, pth)
    ref = a.ood_faceGAN_restyle(
        out_size=256, style_dim=512, n_mlp=2, channel_multiplier=1,
        encoder="ReStyle", ReStyle_pth=pth, enc_cycle=2,
        enable_modulation=True, modulation_type="NOISE", warp_scale=0.08,
        blend_with_gen=True, ModSize=256, cycle_align=1)
    ref.delta_latent = torch.nn.Parameter(
        torch.zeros(1, ref.style_cnt, 512), requires_grad=False)
    ref.eval()
    sd = perturb_state_dict(ref, seed=30)

    flat, leftovers = convert_ood_restyle_arch(sd)
    assert not leftovers, leftovers
    flat = {k: v for k, v in flat.items()
            if not k.startswith("generator/style_")}

    net = OODFaceGANReStyle(out_size=256, style_dim=512, n_mlp=2,
                            channel_multiplier=1, encoder="ReStyle",
                            enc_cycle=2, enable_modulation=True,
                            modulation_type="NOISE", warp_scale=0.08,
                            cycle_align=1, blend_with_gen=True)
    x = (np.random.RandomState(31).rand(1, 256, 256, 3).astype(np.float32)
         * 2 - 1)
    with jax_zero_noise():
        init = net.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                        mod_size=256)
        assert_tree_matches_init(flat, init["params"], "ood_restyle")
        params = unflatten(flat)

        with zero_noise_injection():
            with torch.no_grad():
                ref_out, ref_lats = ref(from_nhwc(x))
        out = net.apply({"params": params}, jnp.asarray(x), mod_size=256)

    np.testing.assert_allclose(np.asarray(out["lats"]), ref_lats.numpy(),
                               atol=2e-3, rtol=0)
    for ind in (1, 2, 3, 4):
        np.testing.assert_allclose(np.asarray(out["aligns"][ind]),
                                   to_nhwc(ref.aligns[ind]), atol=3e-3,
                                   rtol=0)
    np.testing.assert_allclose(np.asarray(out["image"]), to_nhwc(ref_out),
                               atol=6e-3, rtol=0)


def test_fs_encoder_golden(tmp_path):
    """fs_encoder_v2 (arcface iresnet50 trunk + content head + 3x3-pooled
    style concat) vs feature_style_encoder.py:12-74 with converted
    weights."""
    from ood_gan_inversion_tpu.nn.encoders.feature_style import FSEncoderV2
    from convert_torch_weights import convert_fs_encoder

    ir = load_reference_module("src.ops.FeatureStyle.arcface.iresnet")
    fsm = load_reference_module("src.ops.FeatureStyle.feature_style_encoder")
    import easydict
    torch.manual_seed(0)
    arc_pth = str(tmp_path / "arc.pth")
    torch.save(ir.iresnet50().state_dict(), arc_pth)
    ref = fsm.fs_encoder_v2(
        n_styles=14, opts=easydict.EasyDict(arcface_model_path=arc_pth),
        residual=False, use_coeff=False, resnet_layer=[4, 5, 6],
        stride=(2, 2))
    ref.eval()
    sd = perturb_state_dict(ref, seed=40)

    flat, leftovers = convert_fs_encoder(sd, prefix="")
    assert not leftovers, leftovers

    net = FSEncoderV2(n_styles=14, content_stride=2)
    x = (np.random.RandomState(41).rand(2, 256, 256, 3)
         .astype(np.float32) * 2 - 1)
    init = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert_tree_matches_init(flat, init["params"], "fs_enc")
    params = unflatten(flat)

    with torch.no_grad():
        ref_w, ref_content, ref_feats = ref(from_nhwc(x), return_feats=True)
    w, content, feats = net.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=2e-3,
                               rtol=0)
    np.testing.assert_allclose(np.asarray(content), to_nhwc(ref_content),
                               atol=2e-3, rtol=0)
    assert len(feats) == len(ref_feats)
    for f, rf in zip(feats, ref_feats):
        np.testing.assert_allclose(np.asarray(f), to_nhwc(rf), atol=2e-3,
                                   rtol=0)


def test_full_fs_arch_golden(tmp_path):
    """End-to-end ood_faceGAN_FeatureStyle forward
    (OOD_faceGAN_featureStyle_arch.py:271-301): encode -> content injection
    at layer 5 -> SAMM decode -> blend, full converted state_dict,
    zero-noise deterministic."""
    from ood_gan_inversion_tpu.archs.ood_featurestyle import (
        OODFaceGANFeatureStyle)
    from convert_torch_weights import convert_ood_fs_arch

    ir = load_reference_module("src.ops.FeatureStyle.arcface.iresnet")
    fsm = load_reference_module("src.ops.FeatureStyle.feature_style_encoder")
    a = load_reference_module("src.archs.OOD_faceGAN_featureStyle_arch")
    import easydict
    torch.manual_seed(0)
    arc_pth = str(tmp_path / "arc.pth")
    torch.save(ir.iresnet50().state_dict(), arc_pth)
    enc = fsm.fs_encoder_v2(
        n_styles=14, opts=easydict.EasyDict(arcface_model_path=arc_pth),
        residual=False, use_coeff=False, resnet_layer=[4, 5, 6],
        stride=(2, 2))
    fs_pth = str(tmp_path / "fs.pth")
    torch.save(enc.state_dict(), fs_pth)

    ref = a.ood_faceGAN_FeatureStyle(
        out_size=256, style_dim=512, n_mlp=2, channel_multiplier=1,
        encoder="FeatureStyle", FeatureStyle_pth=fs_pth,
        arcface_model_path=arc_pth, enable_modulation=True,
        modulation_type="NOISE", warp_scale=0.08, blend_with_gen=True,
        ModSize=256, cycle_align=1)
    ref.delta_latent = torch.nn.Parameter(
        torch.zeros(1, ref.style_cnt, 512), requires_grad=False)
    ref.eval()
    sd = perturb_state_dict(ref, seed=50)

    flat, leftovers = convert_ood_fs_arch(sd)
    assert not leftovers, leftovers
    flat = {k: v for k, v in flat.items()
            if not k.startswith("generator/style_")}

    net = OODFaceGANFeatureStyle(
        out_size=256, style_dim=512, n_mlp=2, channel_multiplier=1,
        enable_modulation=True, modulation_type="NOISE", warp_scale=0.08,
        cycle_align=1, blend_with_gen=True)
    x = (np.random.RandomState(51).rand(1, 256, 256, 3).astype(np.float32)
         * 2 - 1)
    with jax_zero_noise():
        init = net.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                        mod_size=256)
        assert_tree_matches_init(flat, init["params"], "ood_fs")
        params = unflatten(flat)

        with zero_noise_injection():
            with torch.no_grad():
                ref_out, ref_lats = ref(from_nhwc(x))
        out = net.apply({"params": params}, jnp.asarray(x), mod_size=256)

    np.testing.assert_allclose(np.asarray(out["lats"]), ref_lats.numpy(),
                               atol=2e-3, rtol=0)
    for ind in (1, 2, 3, 4):
        np.testing.assert_allclose(np.asarray(out["aligns"][ind]),
                                   to_nhwc(ref.aligns[ind]), atol=3e-3,
                                   rtol=0)
    np.testing.assert_allclose(np.asarray(out["image"]), to_nhwc(ref_out),
                               atol=6e-3, rtol=0)
