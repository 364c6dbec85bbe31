"""Weight-converter tests: synthetic torch state_dicts shaped exactly like
the reference checkpoints -> converted trees must load into flax-inited
models (matching paths + shapes), and the equal-linear / modulated-conv
mappings must be numerically faithful."""

import math
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from flax import traverse_util

sys.path.insert(0, "tools")
from convert_torch_weights import (convert_stylegan2_generator,
                                   convert_e4e_encoder,
                                   convert_irse50_backbone, convert_vgg19)

from ood_gan_inversion_tpu.nn import Generator
from ood_gan_inversion_tpu.nn.encoders.e4e import Encoder4Editing
from ood_gan_inversion_tpu.nn.irse import ArcFaceBackbone, get_blocks
from ood_gan_inversion_tpu.nn.vgg import VGGFeatureExtractor


def t(*shape):
    return torch.randn(*shape)


def synth_stylegan2_sd(size=64, style_dim=64, n_mlp=2, cm=1):
    channels = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm,
                128: 128 * cm, 256: 64 * cm}
    log = int(math.log2(size))
    sd = {}
    for i in range(1, n_mlp + 1):
        sd[f"style.{i}.weight"] = t(style_dim, style_dim)
        sd[f"style.{i}.bias"] = t(style_dim)
    sd["input.input"] = t(1, channels[4], 4, 4)

    def styled(prefix, cin, cout, k=3):
        sd[f"{prefix}.conv.weight"] = t(1, cout, cin, k, k)
        sd[f"{prefix}.conv.modulation.weight"] = t(cin, style_dim)
        sd[f"{prefix}.conv.modulation.bias"] = t(cin)
        sd[f"{prefix}.noise.weight"] = t(1)
        sd[f"{prefix}.activate.bias"] = t(cout)

    def rgb(prefix, cin):
        sd[f"{prefix}.conv.weight"] = t(1, 3, cin, 1, 1)
        sd[f"{prefix}.conv.modulation.weight"] = t(cin, style_dim)
        sd[f"{prefix}.conv.modulation.bias"] = t(cin)
        sd[f"{prefix}.bias"] = t(1, 3, 1, 1)

    styled("conv1", channels[4], channels[4])
    rgb("to_rgb1", channels[4])
    cin = channels[4]
    idx = 0
    for i in range(3, log + 1):
        cout = channels[2 ** i]
        styled(f"convs.{idx}", cin, cout)
        styled(f"convs.{idx + 1}", cout, cout)
        rgb(f"to_rgbs.{idx // 2}", cout)
        cin = cout
        idx += 2
    return sd


def assert_loads(converted_flat, init_params, allow_missing=()):
    init_flat = traverse_util.flatten_dict(init_params, sep="/")
    unexpected = set(converted_flat) - set(init_flat)
    assert not unexpected, f"unexpected: {sorted(unexpected)[:8]}"
    missing = set(init_flat) - set(converted_flat)
    missing = {m for m in missing
               if not any(m.startswith(a) for a in allow_missing)}
    assert not missing, f"missing: {sorted(missing)[:8]}"
    for k in converted_flat:
        assert converted_flat[k].shape == init_flat[k].shape, (
            k, converted_flat[k].shape, init_flat[k].shape)


def test_stylegan2_generator_conversion_structural():
    sd = synth_stylegan2_sd()
    out, leftovers = convert_stylegan2_generator(sd, prefix="generator")
    assert not leftovers
    gen = Generator(size=64, style_dim=64, n_mlp=2, channel_multiplier=1)
    rng = jax.random.PRNGKey(0)
    lats = jnp.zeros((1, 10, 64))
    params = gen.init({"params": rng, "noise": rng}, lats,
                      method=Generator.init_stub)["params"]
    assert_loads(out, {"generator": params})


def test_stylegan2_style_mlp_numerics():
    """Converted style-MLP weights must reproduce torch EqualLinear math:
    fused_lrelu(x @ (W.T*scale) + b*lr_mul) with lr_mul=0.01."""
    sd = synth_stylegan2_sd()
    out, _ = convert_stylegan2_generator(sd, prefix="generator")
    gen = Generator(size=64, style_dim=64, n_mlp=2, channel_multiplier=1)
    rng = jax.random.PRNGKey(0)
    lats = jnp.zeros((1, 10, 64))
    params = gen.init({"params": rng, "noise": rng}, lats,
                      method=Generator.init_stub)["params"]
    flat = traverse_util.flatten_dict({"generator": params}, sep="/")
    flat.update({k: jnp.asarray(v) for k, v in out.items()})
    params2 = traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})["generator"]

    z = np.random.RandomState(0).randn(3, 64).astype(np.float32)
    got = np.asarray(gen.apply({"params": params2}, jnp.asarray(z),
                               method=Generator.style_mlp))

    x = torch.from_numpy(z)
    x = x * torch.rsqrt(torch.mean(x ** 2, dim=1, keepdim=True) + 1e-8)
    lr_mul = 0.01
    for i in (1, 2):
        w = sd[f"style.{i}.weight"]
        b = sd[f"style.{i}.bias"]
        scale = (1 / math.sqrt(64)) * lr_mul
        x = torch.nn.functional.linear(x, w * scale)
        x = torch.nn.functional.leaky_relu(
            x + (b * lr_mul).view(1, -1), 0.2) * math.sqrt(2)
    np.testing.assert_allclose(got, x.numpy(), rtol=1e-4, atol=1e-5)


def synth_irse_sd(se=True, with_output_layer=False):
    sd = {}
    sd["input_layer.0.weight"] = t(64, 3, 3, 3)
    for s in ("weight", "bias"):
        sd[f"input_layer.1.{s}"] = t(64)
    sd["input_layer.1.running_mean"] = t(64)
    sd["input_layer.1.running_var"] = torch.rand(64) + 0.5
    sd["input_layer.2.weight"] = t(64)
    i = 0
    for block in get_blocks(50):
        for unit in block:
            b = f"body.{i}"
            if unit.in_channel != unit.depth:
                sd[f"{b}.shortcut_layer.0.weight"] = t(unit.depth,
                                                       unit.in_channel, 1, 1)
                for s in ("weight", "bias"):
                    sd[f"{b}.shortcut_layer.1.{s}"] = t(unit.depth)
                sd[f"{b}.shortcut_layer.1.running_mean"] = t(unit.depth)
                sd[f"{b}.shortcut_layer.1.running_var"] = torch.rand(unit.depth) + 0.5
            for s in ("weight", "bias"):
                sd[f"{b}.res_layer.0.{s}"] = t(unit.in_channel)
            sd[f"{b}.res_layer.0.running_mean"] = t(unit.in_channel)
            sd[f"{b}.res_layer.0.running_var"] = torch.rand(unit.in_channel) + 0.5
            sd[f"{b}.res_layer.1.weight"] = t(unit.depth, unit.in_channel, 3, 3)
            sd[f"{b}.res_layer.2.weight"] = t(unit.depth)
            sd[f"{b}.res_layer.3.weight"] = t(unit.depth, unit.depth, 3, 3)
            for s in ("weight", "bias"):
                sd[f"{b}.res_layer.4.{s}"] = t(unit.depth)
            sd[f"{b}.res_layer.4.running_mean"] = t(unit.depth)
            sd[f"{b}.res_layer.4.running_var"] = torch.rand(unit.depth) + 0.5
            if se:
                sd[f"{b}.res_layer.5.fc1.weight"] = t(unit.depth // 16,
                                                      unit.depth, 1, 1)
                sd[f"{b}.res_layer.5.fc2.weight"] = t(unit.depth,
                                                      unit.depth // 16, 1, 1)
            i += 1
    if with_output_layer:
        for s in ("weight", "bias"):
            sd[f"output_layer.0.{s}"] = t(512)
        sd["output_layer.0.running_mean"] = t(512)
        sd["output_layer.0.running_var"] = torch.rand(512) + 0.5
        sd["output_layer.3.weight"] = t(512, 512 * 7 * 7)
        sd["output_layer.3.bias"] = t(512)
        sd["output_layer.4.running_mean"] = t(512)
        sd["output_layer.4.running_var"] = torch.rand(512) + 0.5
        sd["output_layer.4.weight"] = t(512)
        sd["output_layer.4.bias"] = t(512)
    return sd


def test_e4e_encoder_conversion_structural():
    sd = synth_irse_sd(se=True)
    for i in range(10):  # style_count for 64px stylegan
        spatial = 16 if i < 3 else (32 if i < 7 else 64)
        n_convs = int(np.log2(spatial))
        for j in range(n_convs):
            cin = 512
            sd[f"styles.{i}.convs.{2 * j}.weight"] = t(512, cin, 3, 3)
            sd[f"styles.{i}.convs.{2 * j}.bias"] = t(512)
        sd[f"styles.{i}.linear.weight"] = t(512, 512)
        sd[f"styles.{i}.linear.bias"] = t(512)
    sd["latlayer1.weight"] = t(512, 256, 1, 1)
    sd["latlayer1.bias"] = t(512)
    sd["latlayer2.weight"] = t(512, 128, 1, 1)
    sd["latlayer2.bias"] = t(512)
    # simulate the e4e ckpt's 'encoder.' prefix
    sd = {"encoder." + k: v for k, v in sd.items()}

    out, leftovers = convert_e4e_encoder(sd, prefix="encoder")
    assert not leftovers
    enc = Encoder4Editing(num_layers=50, mode="ir_se", stylegan_size=64)
    params = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 256, 256, 3)))["params"]
    assert_loads(out, {"encoder": params})


def test_irse50_backbone_conversion_structural():
    sd = synth_irse_sd(se=True, with_output_layer=True)
    out, leftovers = convert_irse50_backbone(sd)
    assert not leftovers
    net = ArcFaceBackbone()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 112, 112, 3)))["params"]
    assert_loads(out, params)


def test_vgg19_conversion_structural():
    cfg = [(64, 3), (64, 64), (128, 64), (128, 128),
           (256, 128), (256, 256), (256, 256), (256, 256),
           (512, 256), (512, 512), (512, 512), (512, 512),
           (512, 512), (512, 512), (512, 512), (512, 512)]
    from convert_torch_weights import VGG19_CONV_IDX
    sd = {}
    for (co, ci), idx in zip(cfg, VGG19_CONV_IDX):
        sd[f"features.{idx}.weight"] = t(co, ci, 3, 3)
        sd[f"features.{idx}.bias"] = t(co)
    out, _ = convert_vgg19(sd)
    vgg = VGGFeatureExtractor(layer_name_list=("conv1_2", "conv2_2", "conv3_4",
                                               "conv4_4", "conv5_4"))
    params = vgg.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)))["params"]
    flat = traverse_util.flatten_dict(params, sep="/")
    for k, v in out.items():
        assert k in flat and flat[k].shape == v.shape, k
