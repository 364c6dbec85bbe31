"""Golden TRAIN-STEP parity: run the ACTUAL reference training step
(src/models/OOD_faceGAN_model.py:optimize_parameters, L578-789) on CPU with
random weights, push every network state_dict through the converter, run OUR
train_step from the identical state, and assert the logged loss values match.

This pins the training WIRING (loss weights, phase ordering, D-then-G update
order, r1 scaling, detached-adversarial-G semantics) to the reference — the
module-level golden tests (test_reference_parity*.py) already pin each
forward; this test pins how the model layer composes them.

Only registry/bookkeeping glue is stubbed (build_network/build_loss dispatch,
logger/imwrite): every COMPUTE line executed on the torch side is actual
reference code — basicsr GANLoss/MSELoss (BasicSR/basicsr/losses/losses.py),
src.losses.mask_loss, basicsr BaseModel/StyleGAN2Model, and the OOD model
itself. Noise protocol: zero injected noise on both sides (ref_compat.
zero_noise_injection / explicit zero lists), so both steps are deterministic.

Config mirrors options/train/E4E_Face.yml at micro scale: skip_latent_g true
(the shipped setting — also removes the reference's torch.randn random_gen
from the compared path), wgan_softplus GAN, MSE pixel, mask loss.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import ref_compat
from ref_compat import (install_reference_stubs, load_reference_module,
                        load_real_basicsr, zero_noise_injection, _module)
from test_reference_parity import (perturb_state_dict, clean, unflatten,
                                   zero_noise_lists, assert_tree_matches_init)
from convert_torch_weights import (convert_ood_e4e_arch,
                                   convert_stylegan2_discriminator,
                                   convert_latent_discriminator)

SIZE = 64
B, K = 2, 1

MASK_CFG = {"binary": [32, 64], "area": {"32": 0.3, "64": 0.3},
            "target": 1, "binary_weight": 4e-2}

ARCH_KW = dict(out_size=SIZE, style_dim=512, n_mlp=2, channel_multiplier=1,
               encoder="E4E", enable_modulation=True,
               modulation_type="NOISE", warp_scale=0.08, cycle_align=2,
               blend_with_gen=True)


def _load_reference_model_module():
    """Import src.models.OOD_faceGAN_model with the model-layer spine
    (BaseModel, StyleGAN2Model, losses) loaded as REAL reference files and
    only registry dispatch stubbed."""
    install_reference_stubs()
    bs = sys.modules["basicsr"]

    # losses.py imports VGGFeatureExtractor at module top (vgg_arch needs
    # torchvision) — stub the symbol; the perceptual class is never built
    if "basicsr.archs.vgg_arch" not in sys.modules:
        class _NoVGG:
            def __init__(self, *a, **k):
                raise RuntimeError("vgg_arch stub: torchvision absent")
        _module("basicsr.archs.vgg_arch", VGGFeatureExtractor=_NoVGG)
        bs.archs.vgg_arch = sys.modules["basicsr.archs.vgg_arch"]

    import logging
    u = sys.modules["basicsr.utils"]
    for name, val in (("get_root_logger",
                       lambda *a, **k: logging.getLogger("ref_compat")),
                      ("imwrite", lambda *a, **k: None),
                      ("tensor2img", lambda *a, **k: None)):
        if not hasattr(u, name):
            setattr(u, name, val)

    losses_mod = load_real_basicsr("basicsr.losses.losses")
    load_real_basicsr("basicsr.models.lr_scheduler")
    load_real_basicsr("basicsr.utils.dist_util")
    load_real_basicsr("basicsr.models.base_model")

    arch_e4e = load_reference_module("src.archs.OOD_faceGAN_e4e_arch")
    arch_d = load_reference_module("src.archs.Discriminator_arch")
    mask_mod = load_reference_module("src.losses.mask_loss")

    def build_network(opt):
        opt = dict(opt)
        cls = {"ood_faceGAN_e4e": arch_e4e.ood_faceGAN_e4e,
               "StyleGAN2Discriminator_mod": arch_d.StyleGAN2Discriminator_mod,
               "LatentDiscrinimator": arch_d.LatentDiscrinimator}[
                   opt.pop("type")]
        return cls(**opt)

    def build_loss(opt):
        opt = dict(opt)
        cls = {"GANLoss": losses_mod.GANLoss, "MSELoss": losses_mod.MSELoss,
               "MaskLoss": mask_mod.MaskLoss}[opt.pop("type")]
        return cls(**opt)

    sys.modules["basicsr.archs"].build_network = build_network
    sys.modules["basicsr.losses"].build_loss = build_loss
    # other parity modules may have created basicsr.metrics as an empty
    # package placeholder (load_real_basicsr parent stubs) — ensure the attr
    metrics_mod = sys.modules.get("basicsr.metrics")
    if metrics_mod is None:
        metrics_mod = _module("basicsr.metrics")
    if not hasattr(metrics_mod, "calculate_metric"):
        metrics_mod.calculate_metric = lambda *a, **k: None
    bs.metrics = metrics_mod

    load_real_basicsr("basicsr.models.stylegan2_model")
    return load_reference_module("src.models.OOD_faceGAN_model")


def _ref_opt():
    return {
        "name": "trainstep_parity", "model_type": "ood_faceGAN_Model",
        "num_gpu": 0, "is_train": True, "dist": False, "rank": 0,
        "world_size": 1, "is_mimo": True, "logger": {}, "path": {},
        "network_g": {"type": "ood_faceGAN_e4e", **ARCH_KW,
                      "stage": "Inference", "ModSize": SIZE},
        "network_d": {"type": "StyleGAN2Discriminator_mod", "out_size": SIZE,
                      "channel_multiplier": 1},
        "network_d2": {"type": "LatentDiscrinimator", "chn": 10, "dim": 512,
                       "n_mlp": 2, "hidden_chn": 4},
        "train": {
            "optim_g": {"type": "Adam", "lr": 2e-5,
                        "generator_lr_decay": 1.0},
            "optim_d": {"type": "Adam", "lr": 2e-5},
            "optim_d2": {"type": "Adam", "lr": 2e-5},
            "scheduler": {"type": "MultiStepLR", "milestones": 15000,
                          "gamma": 0.75},
            "total_iter": 30000,
            "startup_iter": 10 ** 9,
            "fix_and_grad": {"fix": ["generator", "avg_latent", "encoder"],
                             "grad": []},
            "skip_latent_g": True,
            "grad_clip_norm": 999.0,
            "gan_opt": {"type": "GANLoss", "gan_type": "wgan_softplus",
                        "loss_weight": 0.5},
            "r1_reg_weight": 10.0, "path_reg_weight": 2.0,
            "mixing_prob": 0.9,
            "net_d_reg_every": 2, "net_g_reg_every": 10 ** 9,
            "pix_opt": {"type": "MSELoss", "loss_weight": 1.0},
            # ldm_opt is a generic registry-built loss on (fake_hr, gt) in
            # the reference (OOD_faceGAN_model.py:183-186, 698-703); pin the
            # wiring with an MSE instance
            "ldm_opt": {"type": "MSELoss", "loss_weight": 0.7},
            "mask_opt": {"type": "MaskLoss", "loss_weight": 5.0,
                         "loss_func": dict(MASK_CFG)},
            "which_gt": "gt",
        },
    }


def _our_opt():
    return {
        "name": "trainstep_parity", "model_type": "ood_faceGAN_Model",
        "is_mimo": True,
        "network_g": {"type": "ood_faceGAN_e4e", **ARCH_KW,
                      "stage": "Inference",
                      "progressiveModSize": [SIZE],
                      "progressiveStart": 10 ** 9, "progressiveStep": 10 ** 9},
        "network_d": {"type": "StyleGAN2Discriminator_mod", "out_size": SIZE,
                      "channel_multiplier": 1},
        "network_d2": {"type": "LatentDiscrinimator", "chn": 10, "dim": 512,
                       "n_mlp": 2, "hidden_chn": 4},
        "train": {
            "optim_g": {"type": "Adam", "lr": 2e-5,
                        "generator_lr_decay": 1.0},
            "optim_d": {"type": "Adam", "lr": 2e-5},
            "optim_d2": {"type": "Adam", "lr": 2e-5},
            "scheduler": {"type": "MultiStepLR", "milestones": 15000,
                          "gamma": 0.75},
            "startup_iter": 10 ** 9,
            "fix_and_grad": {"fix": ["generator", "avg_latent", "encoder"],
                             "grad": []},
            "skip_latent_g": True,
            "grad_clip_norm": 999.0,
            "gan_opt": {"gan_type": "wgan_softplus", "loss_weight": 0.5},
            "r1_reg_weight": 10.0, "path_reg_weight": 2.0,
            "net_d_reg_every": 2, "net_g_reg_every": 10 ** 9,
            "pix_opt": {"type": "MSELoss", "loss_weight": 1.0},
            "ldm_opt": {"type": "MSELoss", "loss_weight": 0.7},
            "mask_opt": {"type": "MaskLoss", "loss_weight": 5.0,
                         "loss_func": dict(MASK_CFG)},
            "which_gt": "gt",
        },
    }


@pytest.fixture(scope="module")
def golden():
    """Reference model state dicts + converted jax state + shared batch."""
    mod = _load_reference_model_module()
    torch.manual_seed(0)
    ref_model = mod.ood_faceGAN_Model(_ref_opt())

    g = ref_model.get_bare_model(ref_model.net_g)
    # the reference hardcodes delta_latent at 18 styles (arch L127); size it
    # for the 64px style count as delta_latent_pth loading would
    g.delta_latent = torch.nn.Parameter(
        torch.randn(1, g.style_cnt, 512) * 0.01, requires_grad=False)
    sd_g = perturb_state_dict(g, seed=21)
    sd_d = perturb_state_dict(ref_model.net_d, seed=22)
    sd_d2 = perturb_state_dict(ref_model.net_d2, seed=23)

    x = (np.random.RandomState(30).rand(B, K, SIZE, SIZE, 3)
         .astype(np.float32) * 2 - 1)

    # ---- our side: build model, load converted params ----
    from ood_gan_inversion_tpu.models import build_model
    from ood_gan_inversion_tpu.models.ood_model import split_params

    model_j = build_model(_our_opt())
    state = model_j.init_state(jax.random.PRNGKey(0), (B * K, SIZE, SIZE, 3))

    flat_g, leftovers = convert_ood_e4e_arch(sd_g)
    assert not leftovers, leftovers
    from ood_gan_inversion_tpu.models.ood_model import merge_params
    from flax import traverse_util
    init_all = merge_params(state.params_g_train, state.params_g_frozen)
    # at out_size 64 the reference still CONSTRUCTS the 256/128px SAMM
    # modulation blocks its decode never reaches (dead params); we don't
    # instantiate dead modules — drop exactly those, nothing else
    init_keys = {"/".join(k)
                 for k in traverse_util.flatten_dict(init_all)}
    dead = {k for k in flat_g if k not in init_keys}
    assert all(k.startswith(("modulation_0/", "modulation_1/"))
               for k in dead), sorted(dead)[:8]
    flat_g = {k: v for k, v in flat_g.items() if k in init_keys}
    assert_tree_matches_init(flat_g, init_all, "ood_e4e_model")
    full_g = unflatten(flat_g)
    train_g, frozen_g = split_params(
        full_g, model_j.fix_list, model_j.grad_list)

    flat_d = clean(convert_stylegan2_discriminator(sd_d, prefix="d")[0])
    assert_tree_matches_init(flat_d, state.params_d, "net_d")
    flat_d2 = clean(convert_latent_discriminator(sd_d2, prefix="")[0])
    assert_tree_matches_init(flat_d2, state.params_d2, "net_d2")

    state = state.replace(
        params_g_train=train_g, params_g_frozen=frozen_g,
        ema_train=jax.tree_util.tree_map(jnp.copy, train_g),
        params_d=unflatten(flat_d), params_d2=unflatten(flat_d2))

    # zero-noise deterministic forward on our side (same protocol as the
    # arch-level golden tests)
    _, jl = zero_noise_lists(SIZE, batch=B * K)
    model_j._forward = lambda pg, xx, rng, mod_size, stage: \
        model_j.net_g.apply({"params": pg}, xx, mod_size=mod_size,
                            stage=stage, noise=jl)

    batch_j = {"gt": jnp.asarray(x), "lr": jnp.asarray(x),
               "lq_size": jnp.ones((B, K)), "deg_type": jnp.zeros((B, K))}
    return dict(mod=mod, sd_g=sd_g, sd_d=sd_d, sd_d2=sd_d2, x=x,
                model_j=model_j, state=state, batch_j=batch_j)


def _run_reference_step(golden, current_iter):
    """Fresh reference model loaded from the golden state dicts, one
    optimize_parameters call, return its log_dict."""
    torch.manual_seed(1)
    ref_model = golden["mod"].ood_faceGAN_Model(_ref_opt())
    g = ref_model.get_bare_model(ref_model.net_g)
    g.delta_latent = torch.nn.Parameter(
        torch.zeros(1, g.style_cnt, 512), requires_grad=False)
    ref_model.net_g_ema.delta_latent = torch.nn.Parameter(
        torch.zeros(1, g.style_cnt, 512), requires_grad=False)
    g.load_state_dict(golden["sd_g"])
    ref_model.net_d.load_state_dict(golden["sd_d"])
    ref_model.net_d2.load_state_dict(golden["sd_d2"])

    x = golden["x"]
    t5 = torch.from_numpy(np.ascontiguousarray(
        x.transpose(0, 1, 4, 2, 3)))
    ref_model.feed_data({"gt": t5, "lr": t5.clone(),
                         "lq_size": torch.ones(B, K),
                         "deg_type": torch.zeros(B, K)})
    with zero_noise_injection():
        ref_model.optimize_parameters(current_iter)
    return dict(ref_model.log_dict)


@pytest.mark.parametrize("current_iter,extra_keys", [
    (1, ()),                      # plain phase (1 % net_d_reg_every != 0)
    (2, ("l_d_r1",)),             # D r1 variant fires (2 % 2 == 0)
])
def test_trainstep_losses_golden(golden, current_iter, extra_keys):
    ref_logs = _run_reference_step(golden, current_iter)

    # train_step donates its state buffers — hand each test a fresh copy
    state = jax.tree_util.tree_map(jnp.array, golden["state"])
    new_state, logs = golden["model_j"].train_step(
        state, golden["batch_j"], jax.random.PRNGKey(3), current_iter)

    keys = ("l_d", "real_score", "fake_score", "l_g", "l_pix", "l_ldm",
            "l_bin", "l_area") + tuple(extra_keys)
    for key in keys:
        assert key in ref_logs, f"reference did not log {key}"
        assert key in logs, f"we did not log {key}"
        ours, ref = float(logs[key]), float(ref_logs[key])
        np.testing.assert_allclose(
            ours, ref, rtol=0.02, atol=5e-3,
            err_msg=f"iter {current_iter} loss {key}: ours {ours} vs "
                    f"reference {ref}")
    # skip_latent_g: neither side runs the latent-D phase
    assert "l_latent_d" not in ref_logs and "l_latent_d" not in logs


def test_trainstep_latent_phase_golden(golden):
    """skip_latent_g OFF: the latent-D update (style-MLP latents from random
    z vs detached encoder latents) and the G-phase l_latent_g, with the z
    draw pinned to the same values on both sides (the only nondeterminism
    the zero-noise protocol doesn't cover)."""
    z_fixed = np.random.RandomState(40).randn(B * K, 512).astype(np.float32)

    # ---- reference: fresh model with the latent phase on, torch.randn
    # pinned for the (B*K, 512) style draw (random_gen, arch L196) ----
    opt = _ref_opt()
    opt["train"]["skip_latent_g"] = False
    torch.manual_seed(1)
    ref_model = golden["mod"].ood_faceGAN_Model(opt)
    g = ref_model.get_bare_model(ref_model.net_g)
    g.delta_latent = torch.nn.Parameter(
        torch.zeros(1, g.style_cnt, 512), requires_grad=False)
    ref_model.net_g_ema.delta_latent = torch.nn.Parameter(
        torch.zeros(1, g.style_cnt, 512), requires_grad=False)
    g.load_state_dict(golden["sd_g"])
    ref_model.net_d.load_state_dict(golden["sd_d"])
    ref_model.net_d2.load_state_dict(golden["sd_d2"])
    x = golden["x"]
    t5 = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 1, 4, 2, 3)))
    ref_model.feed_data({"gt": t5, "lr": t5.clone(),
                         "lq_size": torch.ones(B, K),
                         "deg_type": torch.zeros(B, K)})

    orig_randn = torch.randn

    def pinned_randn(*size, **kw):
        shape = tuple(size[0]) if len(size) == 1 and isinstance(
            size[0], (tuple, list)) else tuple(size)
        if shape == (B * K, 512):
            return torch.from_numpy(z_fixed.copy())
        return orig_randn(*size, **kw)

    torch.randn = pinned_randn
    try:
        with zero_noise_injection():
            ref_model.optimize_parameters(1)
    finally:
        torch.randn = orig_randn
    ref_logs = dict(ref_model.log_dict)

    # ---- ours: fresh model with the latent phase on, same converted
    # params, jax.random.normal pinned for the same draw ----
    from ood_gan_inversion_tpu.models import build_model
    opt_j = _our_opt()
    opt_j["train"]["skip_latent_g"] = False
    model_j = build_model(opt_j)
    _, jl = zero_noise_lists(SIZE, batch=B * K)
    model_j._forward = lambda pg, xx, rng, mod_size, stage: \
        model_j.net_g.apply({"params": pg}, xx, mod_size=mod_size,
                            stage=stage, noise=jl)
    base = golden["state"]
    state = model_j.init_state(jax.random.PRNGKey(0), (B * K, SIZE, SIZE, 3))
    state = state.replace(
        params_g_train=jax.tree_util.tree_map(jnp.array, base.params_g_train),
        params_g_frozen=jax.tree_util.tree_map(jnp.array,
                                               base.params_g_frozen),
        ema_train=jax.tree_util.tree_map(jnp.array, base.ema_train),
        params_d=jax.tree_util.tree_map(jnp.array, base.params_d),
        params_d2=jax.tree_util.tree_map(jnp.array, base.params_d2))

    orig_normal = jax.random.normal

    def pinned_normal(key, shape=(), *a, **kw):
        if tuple(shape) == (B * K, 512):
            return jnp.asarray(z_fixed)
        return orig_normal(key, shape, *a, **kw)

    jax.random.normal = pinned_normal
    try:
        _, logs = model_j.train_step(state, golden["batch_j"],
                                     jax.random.PRNGKey(3), 1)
    finally:
        jax.random.normal = orig_normal

    for key in ("l_d", "l_latent_d", "real_latent_score",
                "fake_latent_score", "l_g", "l_latent_g", "l_pix", "l_bin",
                "l_area"):
        assert key in ref_logs, f"reference did not log {key}"
        assert key in logs, f"we did not log {key}"
        ours, ref = float(logs[key]), float(ref_logs[key])
        np.testing.assert_allclose(
            ours, ref, rtol=0.02, atol=5e-3,
            err_msg=f"latent-phase loss {key}: ours {ours} vs ref {ref}")


def test_trainstep_path_reg_phase_golden(golden):
    """net_g_reg_every ON (the shipped configs disable it, but the code path
    exists: OOD_faceGAN_model.py:761-777 + g_path_regularize, losses.py:
    408-418): the path-length penalty, its logged path_length, and the
    mean_path_length running-state update, with the randn_like cotangent
    draw pinned to the same values on both sides."""
    cot_fixed = (np.random.RandomState(50)
                 .randn(B * K, SIZE, SIZE, 3).astype(np.float32))

    # ---- reference: fresh model with path reg firing at iter 3 (3 % 3 == 0
    # while D-r1 stays off, 3 % 2 != 0), torch.randn_like pinned ----
    opt = _ref_opt()
    opt["train"]["net_g_reg_every"] = 3
    torch.manual_seed(1)
    ref_model = golden["mod"].ood_faceGAN_Model(opt)
    g = ref_model.get_bare_model(ref_model.net_g)
    g.delta_latent = torch.nn.Parameter(
        torch.zeros(1, g.style_cnt, 512), requires_grad=False)
    ref_model.net_g_ema.delta_latent = torch.nn.Parameter(
        torch.zeros(1, g.style_cnt, 512), requires_grad=False)
    g.load_state_dict(golden["sd_g"])
    ref_model.net_d.load_state_dict(golden["sd_d"])
    ref_model.net_d2.load_state_dict(golden["sd_d2"])
    x = golden["x"]
    t5 = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 1, 4, 2, 3)))
    ref_model.feed_data({"gt": t5, "lr": t5.clone(),
                         "lq_size": torch.ones(B, K),
                         "deg_type": torch.zeros(B, K)})

    cot_t = torch.from_numpy(
        np.ascontiguousarray(cot_fixed.transpose(0, 3, 1, 2)))
    orig_randn_like = torch.randn_like

    def pinned_randn_like(t, **kw):
        if tuple(t.shape) == (B * K, 3, SIZE, SIZE):
            return cot_t.clone()
        return orig_randn_like(t, **kw)

    torch.randn_like = pinned_randn_like
    try:
        with zero_noise_injection():
            ref_model.optimize_parameters(3)
    finally:
        torch.randn_like = orig_randn_like
    ref_logs = dict(ref_model.log_dict)
    ref_mpl = float(ref_model.mean_path_length)
    assert "l_g_path" in ref_logs, "reference path reg did not fire"

    # ---- ours: fresh model, same converted params, the decode's noise
    # zeroed through the _decode_samm hook and the cotangent pinned through
    # the _path_cot hook ----
    from ood_gan_inversion_tpu.models import build_model
    opt_j = _our_opt()
    opt_j["train"]["net_g_reg_every"] = 3
    model_j = build_model(opt_j)
    _, jl = zero_noise_lists(SIZE, batch=B * K)
    model_j._forward = lambda pg, xx, rng, mod_size, stage: \
        model_j.net_g.apply({"params": pg}, xx, mod_size=mod_size,
                            stage=stage, noise=jl)
    net_t = type(model_j.net_g)
    model_j._decode_samm = lambda pg, lats, feats_c, xx, rng, mod_size: \
        model_j.net_g.apply({"params": pg}, lats, feats_c, xx, mod_size,
                            method=net_t.decode_samm, noise=jl)
    hw = float(SIZE * SIZE)
    model_j._path_cot = lambda rng, shape, dtype: \
        jnp.asarray(cot_fixed, dtype) / jnp.sqrt(hw)

    base = golden["state"]
    state = model_j.init_state(jax.random.PRNGKey(0), (B * K, SIZE, SIZE, 3))
    state = state.replace(
        params_g_train=jax.tree_util.tree_map(jnp.array, base.params_g_train),
        params_g_frozen=jax.tree_util.tree_map(jnp.array,
                                               base.params_g_frozen),
        ema_train=jax.tree_util.tree_map(jnp.array, base.ema_train),
        params_d=jax.tree_util.tree_map(jnp.array, base.params_d),
        params_d2=jax.tree_util.tree_map(jnp.array, base.params_d2))

    new_state, logs = model_j.train_step(state, golden["batch_j"],
                                         jax.random.PRNGKey(3), 3)

    for key in ("l_d", "real_score", "fake_score", "l_g", "l_pix", "l_bin",
                "l_area", "l_g_path", "path_length"):
        assert key in ref_logs, f"reference did not log {key}"
        assert key in logs, f"we did not log {key}"
        ours, ref = float(logs[key]), float(ref_logs[key])
        np.testing.assert_allclose(
            ours, ref, rtol=0.02, atol=5e-3,
            err_msg=f"path-phase loss {key}: ours {ours} vs ref {ref}")
    np.testing.assert_allclose(
        float(new_state.mean_path_length), ref_mpl, rtol=0.02, atol=1e-5,
        err_msg="mean_path_length running state diverged")
