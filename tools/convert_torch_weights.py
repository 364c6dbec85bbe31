#!/usr/bin/env python
"""Convert the reference's torch checkpoints to this framework's param trees.

Checkpoint families (SURVEY.md §5.4 / reference arch L137-153):
  * stylegan2   — rosinality StyleGAN2 `g_ema` (stylegan2-ffhq-config-f.pth)
  * e4e         — e4e_ffhq_encode.pt (state_dict, 'encoder.'-prefixed subset)
  * irse50      — model_ir_se50.pth (ArcFace ID backbone)
  * vgg19       — torchvision vgg19 features (perceptual loss)
  * lpips_alex  — torchvision alexnet features + lpips alex.pth lin weights
  * stylegan2_d — BasicSR-style StyleGAN2Discriminator (net_d)

Output: flat .npz with '/'-joined param paths matching flax init trees
(load with run_inversion.py --ckpt or path.pretrain_network_* in YAML).

Layout rules (torch -> jax):
  conv weight   (O,I,kh,kw)   -> HWIO (kh,kw,I,O)        perm (2,3,1,0)
  mod-conv      (1,O,I,kh,kw) -> HWIO                     squeeze + same
  linear weight (O,I)         -> (I,O)                    transpose
  BatchNorm     weight/bias/running_mean/running_var -> scale/bias/mean/var
  flatten-linear(O, C*h*w)    -> NCHW-flatten kept; our modules transpose
                                 NHWC->NCHW before flattening, so no remap.

Usage:
  python tools/convert_torch_weights.py stylegan2 <pth> <out.npz> [--key g_ema]
  python tools/convert_torch_weights.py e4e <pt> <out.npz>
  ...
"""

import argparse
import sys

import numpy as np


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      dtype=np.float32)


def conv_w(x):
    return np.transpose(_t(x), (2, 3, 1, 0))


def modconv_w(x):
    a = _t(x)
    if a.ndim == 5:
        a = a[0]
    return np.transpose(a, (2, 3, 1, 0))


def linear_w(x):
    return np.transpose(_t(x), (1, 0))


def structural_key(k: str) -> bool:
    """Buffers that are compile-time constants (FIR kernels) or torch
    bookkeeping (BN step counters) — never converted, never 'leftover'."""
    return k.endswith("num_batches_tracked") or k.endswith("kernel")


def put_bn(out, prefix, sd, key, suffix=""):
    out[f"{prefix}/scale"] = _t(sd[f"{key}.weight"])
    out[f"{prefix}/bias"] = _t(sd[f"{key}.bias"])
    out[f"{prefix}/mean"] = _t(sd[f"{key}.running_mean"])
    out[f"{prefix}/var"] = _t(sd[f"{key}.running_var"])


# ---------------------------------------------------------------- stylegan2

def convert_stylegan2_generator(sd, prefix="generator"):
    """rosinality Generator state_dict -> our Generator param paths
    (cf. src/ops/StyleGAN/model.py:375-459 module layout)."""
    out = {}
    consumed = set()

    def take(k):
        consumed.add(k)
        return sd[k]

    n_mlp = len([k for k in sd if k.startswith("style.") and k.endswith(".weight")])
    for i in range(1, n_mlp + 1):   # style.0 is PixelNorm (no params)
        out[f"{prefix}/style_{i - 1}/weight"] = linear_w(take(f"style.{i}.weight"))
        out[f"{prefix}/style_{i - 1}/bias"] = _t(take(f"style.{i}.bias"))

    out[f"{prefix}/input"] = np.transpose(_t(take("input.input")), (0, 2, 3, 1))

    def styled_conv(dst, src):
        out[f"{dst}/conv/weight"] = modconv_w(take(f"{src}.conv.weight"))
        out[f"{dst}/conv/modulation/weight"] = linear_w(
            take(f"{src}.conv.modulation.weight"))
        out[f"{dst}/conv/modulation/bias"] = _t(take(f"{src}.conv.modulation.bias"))
        out[f"{dst}/noise/weight"] = _t(take(f"{src}.noise.weight"))
        out[f"{dst}/activate/bias"] = _t(take(f"{src}.activate.bias"))

    def to_rgb(dst, src):
        out[f"{dst}/conv/weight"] = modconv_w(take(f"{src}.conv.weight"))
        out[f"{dst}/conv/modulation/weight"] = linear_w(
            take(f"{src}.conv.modulation.weight"))
        out[f"{dst}/conv/modulation/bias"] = _t(take(f"{src}.conv.modulation.bias"))
        out[f"{dst}/bias"] = _t(take(f"{src}.bias")).reshape(-1)

    styled_conv(f"{prefix}/conv1", "conv1")
    to_rgb(f"{prefix}/to_rgb1", "to_rgb1")
    n_pairs = len([k for k in sd if k.startswith("to_rgbs.")
                   and k.endswith(".bias") and ".modulation" not in k
                   and ".conv." not in k])
    for i in range(2 * n_pairs):
        styled_conv(f"{prefix}/convs_{i}", f"convs.{i}")
    for i in range(n_pairs):
        to_rgb(f"{prefix}/to_rgbs_{i}", f"to_rgbs.{i}")

    # noises.* buffers and the FIR blur/upsample kernels are structural
    # constants (make_kernel compile-time numpy on our side), not weights
    leftovers = [k for k in sd if k not in consumed
                 and not k.startswith("noises.")
                 and not k.endswith("kernel")]
    return out, leftovers


# ------------------------------------------------------------------- IR-SE

def convert_irse_trunk(sd, prefix, src_prefix="", n_body=24, se=True):
    """input_layer + body.{i} of an IR(-SE) net -> IRSETrunk paths."""
    out = {}
    consumed = set()

    def take(k):
        consumed.add(src_prefix + k)
        return sd[src_prefix + k]

    def has(k):
        return (src_prefix + k) in sd

    out[f"{prefix}/input_conv/weight"] = conv_w(take("input_layer.0.weight"))
    put_bn(out, f"{prefix}/input_norm/norm", sd, f"{src_prefix}input_layer.1")
    consumed.update(f"{src_prefix}input_layer.1.{s}" for s in
                    ("weight", "bias", "running_mean", "running_var"))
    out[f"{prefix}/input_prelu/weight"] = _t(take("input_layer.2.weight"))

    for i in range(n_body):
        b = f"body.{i}"
        d = f"{prefix}/body_{i}"
        if has(f"{b}.shortcut_layer.0.weight"):
            out[f"{d}/shortcut_conv/weight"] = conv_w(
                take(f"{b}.shortcut_layer.0.weight"))
            if has(f"{b}.shortcut_layer.0.bias"):
                out[f"{d}/shortcut_conv/bias"] = _t(
                    take(f"{b}.shortcut_layer.0.bias"))
            put_bn(out, f"{d}/shortcut_norm/norm", sd,
                   f"{src_prefix}{b}.shortcut_layer.1")
            consumed.update(f"{src_prefix}{b}.shortcut_layer.1.{s}" for s in
                            ("weight", "bias", "running_mean", "running_var"))
        put_bn(out, f"{d}/norm1/norm", sd, f"{src_prefix}{b}.res_layer.0")
        consumed.update(f"{src_prefix}{b}.res_layer.0.{s}" for s in
                        ("weight", "bias", "running_mean", "running_var"))
        out[f"{d}/conv1/weight"] = conv_w(take(f"{b}.res_layer.1.weight"))
        out[f"{d}/prelu/weight"] = _t(take(f"{b}.res_layer.2.weight"))
        out[f"{d}/conv2/weight"] = conv_w(take(f"{b}.res_layer.3.weight"))
        put_bn(out, f"{d}/norm2/norm", sd, f"{src_prefix}{b}.res_layer.4")
        consumed.update(f"{src_prefix}{b}.res_layer.4.{s}" for s in
                        ("weight", "bias", "running_mean", "running_var"))
        if se and has(f"{b}.res_layer.5.fc1.weight"):
            out[f"{d}/se/fc1/weight"] = conv_w(take(f"{b}.res_layer.5.fc1.weight"))
            out[f"{d}/se/fc2/weight"] = conv_w(take(f"{b}.res_layer.5.fc2.weight"))
    return out, consumed


def _convert_style_blocks(sd, prefix, out, consumed):
    """styles.{i} GradualStyleBlock stacks -> style_{i} paths (shared by the
    E4E and ReStyle encoders)."""
    style_ids = sorted({int(k.split(".")[1]) for k in sd
                        if k.startswith("styles.")})
    for i in style_ids:
        conv_keys = sorted(
            (int(k.split(".")[3]) for k in sd
             if k.startswith(f"styles.{i}.convs.") and k.endswith(".weight")))
        for j, torch_idx in enumerate(conv_keys):
            out[f"{prefix}/style_{i}/conv_{j}/weight"] = conv_w(
                sd[f"styles.{i}.convs.{torch_idx}.weight"])
            out[f"{prefix}/style_{i}/conv_{j}/bias"] = _t(
                sd[f"styles.{i}.convs.{torch_idx}.bias"])
            consumed.update({f"styles.{i}.convs.{torch_idx}.weight",
                             f"styles.{i}.convs.{torch_idx}.bias"})
        out[f"{prefix}/style_{i}/linear/weight"] = linear_w(
            sd[f"styles.{i}.linear.weight"])
        out[f"{prefix}/style_{i}/linear/bias"] = _t(sd[f"styles.{i}.linear.bias"])
        consumed.update({f"styles.{i}.linear.weight", f"styles.{i}.linear.bias"})


def convert_e4e_encoder(sd, prefix="encoder"):
    """e4e_ffhq_encode.pt state_dict (keys may carry 'encoder.' prefix) ->
    Encoder4Editing paths."""
    if any(k.startswith("encoder.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    out, consumed = convert_irse_trunk(sd, f"{prefix}/trunk", n_body=24, se=True)
    _convert_style_blocks(sd, prefix, out, consumed)

    for lat in ("latlayer1", "latlayer2"):
        out[f"{prefix}/{lat}/weight"] = conv_w(sd[f"{lat}.weight"])
        out[f"{prefix}/{lat}/bias"] = _t(sd[f"{lat}.bias"])
        consumed.update({f"{lat}.weight", f"{lat}.bias"})

    leftovers = [k for k in sd if k not in consumed
                 and not structural_key(k)]
    return out, leftovers


def convert_restyle_encoder(sd, prefix="encoder"):
    """ReStyle ProgressiveBackboneEncoder state_dict
    (src/ops/restyle/restyle_e4e_encoder.py:35-110: 6-ch input IR-SE-50
    trunk + per-style GradualStyleBlock(512,512,16)) ->
    nn/encoders/restyle.py paths."""
    if any(k.startswith("encoder.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    out, consumed = convert_irse_trunk(sd, f"{prefix}/trunk", n_body=24, se=True)
    _convert_style_blocks(sd, prefix, out, consumed)
    leftovers = [k for k in sd if k not in consumed
                 and not structural_key(k)]
    return out, leftovers


def convert_ood_restyle_arch(sd):
    """FULL ood_faceGAN_restyle state_dict
    (src/archs/OOD_faceGAN_restyle_arch.py:30-116) -> OODFaceGANReStyle
    params (generator + ReStyle encoder + SAMM modulation + adapters +
    per-layer avg_latent + delta_latent)."""
    out = {}
    sub = lambda pre: {k[len(pre):]: v for k, v in sd.items()
                       if k.startswith(pre)}
    gen, gl = convert_stylegan2_generator(sub("generator."), prefix="generator")
    enc, el = convert_restyle_encoder(sub("encoder."), prefix="encoder")
    mod, ml = convert_ood_modulation(
        {k: v for k, v in sd.items()
         if k.startswith(("modulation.", "feats_conv."))})
    out.update(gen)
    out.update(enc)
    out.update(mod)
    out["avg_latent"] = _t(sd["avg_latent"])
    out["delta_latent"] = _t(sd["delta_latent"])
    leftovers = ([f"generator.{k}" for k in gl] + [f"encoder.{k}" for k in el]
                 + list(ml))
    return out, leftovers


IRESNET50_LAYERS = (3, 4, 14, 3)


def convert_fs_encoder(sd, prefix="encoder"):
    """FeatureStyle fs_encoder_v2 state_dict
    (src/ops/FeatureStyle/feature_style_encoder.py:12-74 over the arcface
    iresnet50 trunk, arcface/iresnet.py:28-130) ->
    nn/encoders/feature_style.py FSEncoderV2 paths."""
    if any(k.startswith("encoder.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    p = (prefix + "/") if prefix else ""
    out = {}
    consumed = set()

    def bn(dst, src):
        put_bn(out, dst, sd, src)
        consumed.update(f"{src}.{s}" for s in
                        ("weight", "bias", "running_mean", "running_var"))

    def conv(dst, src):
        out[dst] = conv_w(sd[f"{src}.weight"])
        consumed.add(f"{src}.weight")

    conv(f"{p}input_conv/weight", "conv.0")
    bn(f"{p}input_bn", "conv.1")
    out[f"{p}input_prelu/weight"] = _t(sd["conv.2.weight"])
    consumed.add("conv.2.weight")

    for li, nblocks in enumerate(IRESNET50_LAYERS, start=1):
        for i in range(nblocks):
            src = f"block_{li}.{i}"
            dst = f"{p}layer{li}/block_{i}"
            bn(f"{dst}/bn1", f"{src}.bn1")
            conv(f"{dst}/conv1/weight", f"{src}.conv1")
            bn(f"{dst}/bn2", f"{src}.bn2")
            out[f"{dst}/prelu/weight"] = _t(sd[f"{src}.prelu.weight"])
            consumed.add(f"{src}.prelu.weight")
            conv(f"{dst}/conv2/weight", f"{src}.conv2")
            bn(f"{dst}/bn3", f"{src}.bn3")
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{dst}/downsample_conv/weight", f"{src}.downsample.0")
                bn(f"{dst}/downsample_bn", f"{src}.downsample.1")

    bn(f"{p}content_bn0", "content_layer.0")
    conv(f"{p}content_conv0/weight", "content_layer.1")
    bn(f"{p}content_bn1", "content_layer.2")
    out[f"{p}content_prelu/weight"] = _t(sd["content_layer.3.weight"])
    consumed.add("content_layer.3.weight")
    conv(f"{p}content_conv1/weight", "content_layer.4")
    bn(f"{p}content_bn2", "content_layer.5")

    style_ids = sorted({int(k.split(".")[1]) for k in sd
                        if k.startswith("styles.")})
    for i in style_ids:
        out[f"{p}style_{i}_weight"] = linear_w(sd[f"styles.{i}.weight"])
        out[f"{p}style_{i}_bias"] = _t(sd[f"styles.{i}.bias"])
        consumed.update({f"styles.{i}.weight", f"styles.{i}.bias"})

    leftovers = [k for k in sd if k not in consumed
                 and not structural_key(k)]
    return out, leftovers


def convert_ood_fs_arch(sd):
    """FULL ood_faceGAN_FeatureStyle state_dict
    (src/archs/OOD_faceGAN_featureStyle_arch.py:28-120) -> OODFaceGANFS
    params (generator + FS encoder + SAMM modulation + adapters +
    avg/delta latents)."""
    out = {}
    sub = lambda pre: {k[len(pre):]: v for k, v in sd.items()
                       if k.startswith(pre)}
    gen, gl = convert_stylegan2_generator(sub("generator."), prefix="generator")
    enc, el = convert_fs_encoder(sub("encoder."), prefix="encoder")
    mod, ml = convert_ood_modulation(
        {k: v for k, v in sd.items()
         if k.startswith(("modulation.", "feats_conv."))})
    out.update(gen)
    out.update(enc)
    out.update(mod)
    out["avg_latent"] = _t(sd["avg_latent"])
    out["delta_latent"] = _t(sd["delta_latent"])
    leftovers = ([f"generator.{k}" for k in gl] + [f"encoder.{k}" for k in el]
                 + list(ml))
    return out, leftovers


def convert_irse50_backbone(sd, prefix=""):
    """face_id model_ir_se50.pth -> ArcFaceBackbone paths."""
    p = (prefix + "/") if prefix else ""
    out, consumed = convert_irse_trunk(sd, f"{p}trunk", n_body=24, se=True)
    put_bn(out, f"{p}out_norm", sd, "output_layer.0")
    out[f"{p}linear_weight"] = linear_w(sd["output_layer.3.weight"])
    out[f"{p}linear_bias"] = _t(sd["output_layer.3.bias"])
    put_bn(out, f"{p}out_norm1d", sd, "output_layer.4")
    if "output_layer.4.weight" not in sd:   # affine=False BN1d
        n = sd["output_layer.4.running_mean"].shape[0]
        out[f"{p}out_norm1d/scale"] = np.ones((n,), np.float32)
        out[f"{p}out_norm1d/bias"] = np.zeros((n,), np.float32)
    consumed.update(k for k in sd if k.startswith("output_layer."))
    leftovers = [k for k in sd if k not in consumed
                 and not structural_key(k)]
    return out, leftovers


# ------------------------------------------------------------------ others

VGG19_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
VGG19_CONV_NAMES = ["conv1_1", "conv1_2", "conv2_1", "conv2_2",
                    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
                    "conv4_1", "conv4_2", "conv4_3", "conv4_4",
                    "conv5_1", "conv5_2", "conv5_3", "conv5_4"]


def convert_vgg19(sd, prefix=""):
    p = (prefix + "/") if prefix else ""
    out = {}
    for idx, name in zip(VGG19_CONV_IDX, VGG19_CONV_NAMES):
        key = f"features.{idx}.weight"
        if key not in sd:
            continue
        out[f"{p}{name}/weight"] = conv_w(sd[key])
        out[f"{p}{name}/bias"] = _t(sd[f"features.{idx}.bias"])
    return out, []


ALEX_CONV_IDX = [0, 3, 6, 8, 10]


def convert_lpips_alex(alexnet_sd, lpips_sd, prefix=""):
    p = (prefix + "/") if prefix else ""
    out = {}
    for i, idx in enumerate(ALEX_CONV_IDX):
        out[f"{p}net/conv{i}/weight"] = conv_w(alexnet_sd[f"features.{idx}.weight"])
        out[f"{p}net/conv{i}/bias"] = _t(alexnet_sd[f"features.{idx}.bias"])
    for i in range(5):
        w = lpips_sd.get(f"lin{i}.model.1.weight",
                         lpips_sd.get(f"lins.{i}.model.1.weight"))
        out[f"{p}lin{i}"] = _t(w).reshape(-1)
    return out, []


def convert_stylegan2_discriminator(sd, prefix="d"):
    """BasicSR StyleGAN2Discriminator (stylegan2_arch.py:766-836) -> our
    Discriminator. BasicSR ConvLayer = [UpFirDnSmooth?, EqualConv2d(+bias),
    ScaledLeakyReLU?] flattened as Sequential; bias lives on the conv, our
    activated layers keep bias in the FusedLeakyReLU."""
    out = {}
    n_res = len({k.split(".")[1] for k in sd if k.startswith("conv_body.")}) - 1
    log_size = n_res + 2          # n_res blocks span log2(size)..3

    def conv_layer(dst, src, activated=True, has_blur=False):
        # BasicSR ConvLayer = Sequential([blur?, EqualConv2d(weight only when
        # activated), FusedLeakyReLU(bias)]) — the bias of an activated layer
        # lives on the ACTIVATION module (stylegan2_arch.py ConvLayer)
        ci = 1 if has_blur else 0
        out[f"{dst}/conv/weight"] = modconv_w(sd[f"{src}.{ci}.weight"])
        if activated and f"{src}.{ci + 1}.bias" in sd:
            out[f"{dst}/act/bias"] = _t(sd[f"{src}.{ci + 1}.bias"])
        elif f"{src}.{ci}.bias" in sd:
            out[f"{dst}/conv/bias"] = _t(sd[f"{src}.{ci}.bias"])

    # conv_body.0: ConvLayer(3, ch, 1)
    conv_layer(f"{prefix}/conv0", "conv_body.0")
    for i in range(1, n_res + 1):
        # ResBlock: conv1 (ConvLayer), conv2 (down, blur first), skip (down)
        src = f"conv_body.{i}"
        dst = f"{prefix}/res_{log_size - i + 1}"
        conv_layer(f"{dst}/conv1", f"{src}.conv1")
        conv_layer(f"{dst}/conv2", f"{src}.conv2", has_blur=True)
        conv_layer(f"{dst}/skip", f"{src}.skip", activated=False, has_blur=True)
    conv_layer(f"{prefix}/final_conv", "final_conv")
    out[f"{prefix}/final_linear0/weight"] = linear_w(sd["final_linear.0.weight"])
    out[f"{prefix}/final_linear0/bias"] = _t(sd["final_linear.0.bias"])
    out[f"{prefix}/final_linear1/weight"] = linear_w(sd["final_linear.1.weight"])
    out[f"{prefix}/final_linear1/bias"] = _t(sd["final_linear.1.bias"])
    return out, []


# ------------------------------------------------------------------- SAMM

def _samm_in(out, dst, sd, src, consumed):
    """InstanceNorm2d(affine=True) -> InstanceNorm2d scale/bias."""
    out[f"{dst}/scale"] = _t(sd[f"{src}.weight"])
    out[f"{dst}/bias"] = _t(sd[f"{src}.bias"])
    consumed.update({f"{src}.weight", f"{src}.bias"})


def _samm_bottleneck(out, dst, sd, src, consumed):
    """Reference bottleneck_IR(bn='InstanceNorm', bias=False)
    (e4e/encoders/helpers.py:426-446) -> _XavierBottleneckIR paths."""
    if f"{src}.shortcut_layer.0.weight" in sd:
        out[f"{dst}/shortcut_conv/weight"] = conv_w(
            sd[f"{src}.shortcut_layer.0.weight"])
        consumed.add(f"{src}.shortcut_layer.0.weight")
        if f"{src}.shortcut_layer.0.bias" in sd:
            out[f"{dst}/shortcut_conv/bias"] = _t(
                sd[f"{src}.shortcut_layer.0.bias"])
            consumed.add(f"{src}.shortcut_layer.0.bias")
        _samm_in(out, f"{dst}/shortcut_norm", sd, f"{src}.shortcut_layer.1",
                 consumed)
    _samm_in(out, f"{dst}/norm1", sd, f"{src}.res_layer.0", consumed)
    out[f"{dst}/conv1/weight"] = conv_w(sd[f"{src}.res_layer.1.weight"])
    out[f"{dst}/prelu"] = _t(sd[f"{src}.res_layer.2.weight"])
    out[f"{dst}/conv2/weight"] = conv_w(sd[f"{src}.res_layer.3.weight"])
    consumed.update({f"{src}.res_layer.1.weight", f"{src}.res_layer.2.weight",
                     f"{src}.res_layer.3.weight"})
    for ck in (f"{src}.res_layer.1.bias", f"{src}.res_layer.3.bias"):
        if ck in sd:
            dk = ("conv1" if ck.endswith("1.bias") else "conv2")
            out[f"{dst}/{dk}/bias"] = _t(sd[ck])
            consumed.add(ck)
    _samm_in(out, f"{dst}/norm2", sd, f"{src}.res_layer.4", consumed)


def convert_spm_warp(sd, prefix="", src_prefix=""):
    """Reference SPM_Warp (SAMM/helpers.py:111-147) -> SPMWarp paths:
    body.body.{0,1}.* -> body/body{0,1}/*. body.norm is affine-free (no
    params); the Blur kernel is a compile-time constant."""
    p = (prefix + "/") if prefix else ""
    out = {}
    consumed = set()
    for j in (0, 1):
        _samm_bottleneck(out, f"{p}body/body{j}", sd,
                         f"{src_prefix}body.body.{j}", consumed)
    consumed.update(k for k in sd if k.startswith(src_prefix)
                    and structural_key(k))
    return out, consumed


def convert_ood_modulation(sd, prefix=""):
    """The reference's trained-checkpoint payload: only params whose names
    contain modulation/feats_conv are saved (OOD_faceGAN_model.py:968-973).
    modulation.{i} -> modulation_{i} (i: 0=256px .. 3=32px), feats_conv.{i}
    -> feats_conv_{i}. The unused modulation.{i}.weight / noiseInj.weight
    members (SAMM/helpers.py:203-206, dropped in the flax block) are skipped.
    """
    p = (prefix + "/") if prefix else ""
    out = {}
    consumed = set()
    mods = sorted({int(k.split(".")[1]) for k in sd
                   if k.startswith("modulation.")})
    for i in mods:
        o, c = convert_spm_warp(sd, f"{p}modulation_{i}/alignment",
                                src_prefix=f"modulation.{i}.alignment.")
        out.update(o)
        consumed |= c
        consumed.update({f"modulation.{i}.weight",
                         f"modulation.{i}.noiseInj.weight"})
    fcs = sorted({int(k.split(".")[1]) for k in sd
                  if k.startswith("feats_conv.")})
    for i in fcs:
        out[f"{p}feats_conv_{i}/weight"] = conv_w(sd[f"feats_conv.{i}.weight"])
        out[f"{p}feats_conv_{i}/bias"] = _t(sd[f"feats_conv.{i}.bias"])
        consumed.update({f"feats_conv.{i}.weight", f"feats_conv.{i}.bias"})
    leftovers = [k for k in sd if k not in consumed
                 and not structural_key(k)]
    return out, leftovers


def convert_ood_e4e_arch(sd):
    """FULL ood_faceGAN_e4e state_dict -> our OODFaceGANE4E param tree
    (generator + encoder + SAMM modulation + adapters + latents). Used by
    the golden reference-parity tests and by whole-model checkpoints."""
    out = {}
    sub = lambda pre: {k[len(pre):]: v for k, v in sd.items()
                       if k.startswith(pre)}
    gen, gl = convert_stylegan2_generator(sub("generator."), prefix="generator")
    enc, el = convert_e4e_encoder(sub("encoder."), prefix="encoder")
    mod, ml = convert_ood_modulation(
        {k: v for k, v in sd.items()
         if k.startswith(("modulation.", "feats_conv."))})
    out.update(gen)
    out.update(enc)
    out.update(mod)
    out["avg_latent"] = _t(sd["avg_latent"])
    out["delta_latent"] = _t(sd["delta_latent"])
    leftovers = ([f"generator.{k}" for k in gl] + [f"encoder.{k}" for k in el]
                 + list(ml))
    return out, leftovers


def convert_latent_discriminator(sd, prefix=""):
    """LatentDiscrinimator (Discriminator_arch.py:28-47) ->
    archs/discriminators.py LatentDiscriminator paths: first_linear,
    layers.{i} -> layer_{i}, final_linear."""
    p = (prefix + "/") if prefix else ""
    out = {}
    consumed = set()

    def lin(dst, src):
        out[f"{dst}/weight"] = linear_w(sd[f"{src}.weight"])
        out[f"{dst}/bias"] = _t(sd[f"{src}.bias"])
        consumed.update({f"{src}.weight", f"{src}.bias"})

    lin(f"{p}first_linear", "first_linear")
    n_layers = len({k.split(".")[1] for k in sd if k.startswith("layers.")})
    for i in range(n_layers):
        lin(f"{p}layer_{i}", f"layers.{i}")
    lin(f"{p}final_linear", "final_linear")
    leftovers = [k for k in sd if k not in consumed and not structural_key(k)]
    return out, leftovers


def convert_gcfsr_generator(sd, prefix=""):
    """Generator_GCFSR (GCFSR_modules.py:404-636) -> nn/gcfsr.py paths.
    Same skeleton as convert_stylegan2_generator, plus the GCFSR extras:
    noise.weight lives as a direct `noise_weight` param in the flax
    StyledConv, and merge='*modulation' variants carry a
    feat_mod.conv0 EqualConv2d per styled conv."""
    p = (prefix + "/") if prefix else ""
    out = {}
    consumed = set()

    def take(k):
        consumed.add(k)
        return sd[k]

    n_mlp = len([k for k in sd if k.startswith("style.")
                 and k.endswith(".weight")])
    for i in range(1, n_mlp + 1):   # style.0 is PixelNorm (no params)
        out[f"{p}style_{i - 1}/weight"] = linear_w(take(f"style.{i}.weight"))
        out[f"{p}style_{i - 1}/bias"] = _t(take(f"style.{i}.bias"))

    out[f"{p}input"] = np.transpose(_t(take("input.input")), (0, 2, 3, 1))

    def styled_conv(dst, src):
        out[f"{dst}/conv/weight"] = modconv_w(take(f"{src}.conv.weight"))
        out[f"{dst}/conv/modulation/weight"] = linear_w(
            take(f"{src}.conv.modulation.weight"))
        out[f"{dst}/conv/modulation/bias"] = _t(
            take(f"{src}.conv.modulation.bias"))
        out[f"{dst}/noise_weight"] = _t(take(f"{src}.noise.weight"))
        if f"{src}.feat_mod.conv0.weight" in sd:
            out[f"{dst}/feat_mod/conv0/weight"] = conv_w(
                take(f"{src}.feat_mod.conv0.weight"))
            out[f"{dst}/feat_mod/conv0/bias"] = _t(
                take(f"{src}.feat_mod.conv0.bias"))
        out[f"{dst}/activate/bias"] = _t(take(f"{src}.activate.bias"))

    def to_rgb(dst, src):
        out[f"{dst}/conv/weight"] = modconv_w(take(f"{src}.conv.weight"))
        out[f"{dst}/conv/modulation/weight"] = linear_w(
            take(f"{src}.conv.modulation.weight"))
        out[f"{dst}/conv/modulation/bias"] = _t(
            take(f"{src}.conv.modulation.bias"))
        out[f"{dst}/bias"] = _t(take(f"{src}.bias")).reshape(-1)

    styled_conv(f"{p}conv1", "conv1")
    to_rgb(f"{p}to_rgb1", "to_rgb1")
    n_pairs = len([k for k in sd if k.startswith("to_rgbs.")
                   and k.endswith(".bias") and ".modulation" not in k
                   and ".conv." not in k])
    for i in range(2 * n_pairs):
        styled_conv(f"{p}convs_{i}", f"convs.{i}")
    for i in range(n_pairs):
        to_rgb(f"{p}to_rgbs_{i}", f"to_rgbs.{i}")

    leftovers = [k for k in sd if k not in consumed
                 and not k.startswith("noises.")
                 and not k.endswith("kernel")]
    return out, leftovers


def convert_arcface_resnet(sd, prefix="", layers=(2, 2, 2, 2)):
    """ResNetArcFace (face_id/arcface_arch.py:171-245, IRBlock trunk) ->
    nn/arcface_resnet.py paths. The reference IRBlock applies ONE shared
    nn.PReLU twice (mid-block and after the residual add,
    arcface_arch.py:86-99); the flax module declares prelu / prelu_out
    separately, so the single slope is duplicated into both."""
    p = (prefix + "/") if prefix else ""
    out = {}
    consumed = set()

    def bn(dst, src):
        put_bn(out, dst, sd, src)
        consumed.update(f"{src}.{s}" for s in
                        ("weight", "bias", "running_mean", "running_var"))

    def conv(dst, src):
        out[f"{dst}/weight"] = conv_w(sd[f"{src}.weight"])
        consumed.add(f"{src}.weight")

    def linear(dst, src):
        out[f"{dst}/kernel"] = linear_w(sd[f"{src}.weight"])
        out[f"{dst}/bias"] = _t(sd[f"{src}.bias"])
        consumed.update({f"{src}.weight", f"{src}.bias"})

    conv(f"{p}conv1", "conv1")
    bn(f"{p}bn1", "bn1")
    out[f"{p}prelu/weight"] = _t(sd["prelu.weight"])
    consumed.add("prelu.weight")
    for li, n in enumerate(layers):
        for bi in range(n):
            s = f"layer{li + 1}.{bi}"
            d = f"{p}layer{li + 1}_{bi}"
            bn(f"{d}/bn0", f"{s}.bn0")
            conv(f"{d}/conv1", f"{s}.conv1")
            bn(f"{d}/bn1", f"{s}.bn1")
            pw = _t(sd[f"{s}.prelu.weight"])
            out[f"{d}/prelu/weight"] = pw
            out[f"{d}/prelu_out/weight"] = pw       # shared in the reference
            consumed.add(f"{s}.prelu.weight")
            conv(f"{d}/conv2", f"{s}.conv2")
            bn(f"{d}/bn2", f"{s}.bn2")
            if f"{s}.se.fc.0.weight" in sd:
                linear(f"{d}/se/fc0", f"{s}.se.fc.0")
                out[f"{d}/se/prelu/weight"] = _t(sd[f"{s}.se.fc.1.weight"])
                consumed.add(f"{s}.se.fc.1.weight")
                linear(f"{d}/se/fc1", f"{s}.se.fc.2")
            if f"{s}.downsample.0.weight" in sd:
                conv(f"{d}/down_conv", f"{s}.downsample.0")
                bn(f"{d}/down_bn", f"{s}.downsample.1")
    bn(f"{p}bn4", "bn4")
    linear(f"{p}fc5", "fc5")
    put_bn(out, f"{p}bn5", sd, "bn5")
    consumed.update(f"bn5.{s}" for s in
                    ("weight", "bias", "running_mean", "running_var"))
    leftovers = [k for k in sd if k not in consumed and not structural_key(k)]
    return out, leftovers


def convert_inception_v3(sd, prefix=""):
    """torchvision inception_v3 -> InceptionV3FID paths. Maps every
    '<block>.<branch>.conv.weight' / '.bn.*'; skips the fc/AuxLogits heads."""
    p = (prefix + "/") if prefix else ""
    out = {}
    for k in sd:
        if not k.endswith(".conv.weight"):
            continue
        mod = k[: -len(".conv.weight")]
        dst = p + mod.replace(".", "/")
        out[f"{dst}/weight"] = conv_w(sd[k])
        put_bn(out, f"{dst}/bn", sd, f"{mod}.bn")
    return out, [k for k in sd
                 if k.startswith(("fc.", "AuxLogits."))
                 and False]  # fc/aux intentionally unused


CONVERTERS = {
    "stylegan2": lambda sd: convert_stylegan2_generator(sd),
    "e4e": lambda sd: convert_e4e_encoder(sd),
    "irse50": lambda sd: convert_irse50_backbone(sd),
    "vgg19": lambda sd: convert_vgg19(sd),
    "stylegan2_d": lambda sd: convert_stylegan2_discriminator(sd),
    "inception": lambda sd: convert_inception_v3(sd),
    # the OOD project's own trained checkpoint (modulation+feats_conv subset,
    # OOD_faceGAN_model.py:968-973) and a full-arch state_dict
    "ood_modulation": lambda sd: convert_ood_modulation(sd),
    "ood_e4e": lambda sd: convert_ood_e4e_arch(sd),
    "ood_restyle": lambda sd: convert_ood_restyle_arch(sd),
    "ood_fs": lambda sd: convert_ood_fs_arch(sd),
    "restyle_encoder": lambda sd: convert_restyle_encoder(sd),
    "fs_encoder": lambda sd: convert_fs_encoder(sd),
    "arcface_resnet": lambda sd: convert_arcface_resnet(sd),
    "latent_d": lambda sd: convert_latent_discriminator(sd),
    "gcfsr": lambda sd: convert_gcfsr_generator(sd),
    # the GPEN-variant generator shares the rosinality module layout, so the
    # stylegan2 mapping applies verbatim (tests/test_reference_parity_families)
    "gpen": lambda sd: convert_stylegan2_generator(sd, prefix=""),
}


def main():
    import torch
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=list(CONVERTERS) + ["lpips_alex"])
    ap.add_argument("pth")
    ap.add_argument("out")
    ap.add_argument("--key", default=None, help="sub-dict key, e.g. g_ema")
    ap.add_argument("--lpips_pth", default=None)
    args = ap.parse_args()

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    if args.key:
        sd = sd[args.key]
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]

    if args.family == "lpips_alex":
        lp = torch.load(args.lpips_pth, map_location="cpu", weights_only=True)
        out, leftovers = convert_lpips_alex(sd, lp)
    else:
        out, leftovers = CONVERTERS[args.family](sd)
    if leftovers:
        print(f"WARNING: {len(leftovers)} unconsumed keys, e.g. "
              f"{leftovers[:5]}", file=sys.stderr)
    np.savez(args.out, **out)
    print(f"wrote {len(out)} arrays to {args.out}")


if __name__ == "__main__":
    main()
