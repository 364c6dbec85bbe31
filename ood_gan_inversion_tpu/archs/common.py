"""Shared SAMM-conditioned decode loop + mask compositing for the three
encoder-family archs (the reference duplicates this across
OOD_faceGAN_{e4e,restyle,featureStyle}_arch.py; here it is one function).

`arch` must be a flax module with submodules .generator (nn.Generator) and
.modulation (list of 4 StyledScaleNShiftBlock, coarse[256px]->fine order is
index 0..3 = [256,128,64,32]px as in the reference ModuleList)."""

import math
import os

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.stylegan2 import feature_modulation
from ..ops.resize import resize_bilinear
from ..parallel.spatial import constrain as sp_constrain

# Rematerialize each decode stage (generator layer pair + SAMM block) during
# the backward pass instead of storing its activations — together with the
# loss-net remat in the model this fits 1024px training in one v5e's 16 GB.
# Gradient values are unchanged; set OGI_DECODE_REMAT=0 to disable.
_DECODE_REMAT = os.environ.get("OGI_DECODE_REMAT", "1") == "1"

# Keep SAMM in fp32 when the arch runs bf16 (see the dtype-boundary note in
# conditioned_decode); OGI_SAMM_FP32=0 lets SAMM follow the arch dtype.
# TRAIN path only — the gradient path keeps the conservative fp32 island.
_SAMM_FP32 = os.environ.get("OGI_SAMM_FP32", "1") == "1"
# INFERENCE island policy, decided separately (r4): with the algebraic
# body0 + t-ctx formulation the fp32 island now LOSES its end-to-end A/B —
# bf16 SAMM serves at 22.84 vs 25.37 ms/img b=1 (PERF.md r4 battery 3; the
# r2 'island wins' verdict predated the algebraic rewrite and went stale).
# Default 0 = SAMM follows the arch dtype at inference; OGI_SAMM_FP32_INFER=1
# restores the fp32 island for strict-precision serving.
_SAMM_FP32_INFER = os.environ.get("OGI_SAMM_FP32_INFER", "0") == "1"
# Per-scale island experiment (round 2): STANDALONE slope-protocol profiling
# (tools/prof/prof_samm_scales2.py) showed bf16 winning at the large SAMM
# scales (256px: 5.25 vs 6.30 ms) — but the end-to-end A/B REGRESSED
# (28.94 vs 25.78 ms/img with bf16 SAMM at 128/256px): in-pipeline the
# boundary casts and lost fusion outweigh the standalone win, the same
# standalone-vs-fused reversal round 1 hit three times (PERF.md). The
# cutoff stays as a knob for both policies.
_SAMM_FP32_MAX_RES = int(os.environ.get("OGI_SAMM_FP32_MAX_RES", "1024"))


def cond_layers_for(mod_size: int, n_feats: int = 4):
    """Generator layers receiving SAMM injection
    (reference feats2condition + cond_ind, OOD_faceGAN_e4e_arch.py:214-222,
    293): 32px->5, 64px->7, 128px->9, 256px->11."""
    if mod_size <= 0:
        return []
    max_size = int(math.floor(math.log2(mod_size)))
    cond_len = min(max(1 + max_size - 5, 0), n_feats)
    return [(2 * (k + 2)) + 1 for k in range(cond_len)]


def conditioned_decode(arch, lats, feats_c, mod_size: int, features_in=None,
                       feature_scale: float = 1.0, noise=None,
                       train: bool = False):
    """SAMM-conditioned StyleGAN2 decode. feats_c: 4 adapted encoder features
    [256px, 128px, 64px, 32px]-res order (i.e. self.feats in the reference).
    features_in: optional {layer_idx: tensor} content injection
    (FeatureStyle; reference model.py:541-546). noise: optional per-layer
    noise list (generator indexing: noise[0] for conv1, noise[1+2*idx] /
    noise[2+2*idx] per pair — same contract as Generator.__call__; None
    entries draw from the 'noise' rng). Returns (image, aligns).

    train: wrap each stage in nn.remat ONLY when True (the model's train
    phases pass it). At inference remat is pure overhead — the checkpoint
    boundaries materialize + copy every stage input/output (measured r4:
    ~3.4 GB of the b=1 pipeline's 6.3 GB HBM write traffic was remat-
    boundary fusions/copies at this call site) and fence cross-stage
    fusion. Values are identical either way."""
    gen = arch.generator
    b = lats.shape[0]
    cond_layers = cond_layers_for(mod_size)
    if noise is None:
        noise = [None] * gen.num_layers

    def insert(out, layer_idx):
        if features_in is not None and features_in.get(layer_idx) is not None:
            f = features_in[layer_idx].astype(out.dtype)
            return (1.0 - feature_scale) * out + feature_scale * f
        return out

    def stage(mdl, out, skip, prev_align, lats, feat, f_in_a, f_in_b,
              n_a, n_b, idx, i, ind):
        """One generator layer pair (+ SAMM when conditioned); `mdl` is the
        arch so flax can lift the stage for remat."""
        g = mdl.generator
        if (ind is None and f_in_a is None and f_in_b is None
                and g.stage_is_packable(idx)):
            # uncond high-res stage: phase-packed coarse-res computation
            # (ops/polyphase.py) — same math, 4x MXU lane utilization
            out, skip = g.packed_stage(
                idx, out, skip, lats[:, i], lats[:, i + 1], lats[:, i + 2],
                noise_a=n_a, noise_b=n_b,
                unpack_out=(idx < len(g.to_rgbs) - 1))
            return out, skip, None
        conv_a = g.convs[2 * idx]
        conv_b = g.convs[2 * idx + 1]
        if f_in_a is not None:
            out = (1.0 - feature_scale) * out + feature_scale * f_in_a.astype(out.dtype)
        align = None
        mod_type = getattr(mdl, "modulation_type", "NOISE")
        if ind is not None and mod_type == "NOISE":
            out_c = conv_a.conv(out, lats[:, i])      # modulated upsample
            mod = mdl.modulation[4 - ind]             # modulation[-ind]
            # SAMM is an fp32 island inside a bf16 pipeline: bf16 makes the
            # rest of the pipeline ~3.9 ms faster but SAMM ~3.8 ms SLOWER
            # (gathers + InstanceNorm casts, PERF.md decomposition), so a
            # bf16 arch casts up at the SAMM boundary and back after.
            dt0 = out_c.dtype
            if ((_SAMM_FP32 if train else _SAMM_FP32_INFER)
                    and dt0 == jnp.bfloat16
                    and out_c.shape[1] <= _SAMM_FP32_MAX_RES):
                aligned_feat, align = mod(feat.astype(jnp.float32),
                                          lats[:, i].astype(jnp.float32),
                                          out_c.astype(jnp.float32),
                                          aligned_coarse=prev_align)
                aligned_feat = aligned_feat.astype(dt0)
            else:
                aligned_feat, align = mod(feat, lats[:, i], out_c,
                                          aligned_coarse=prev_align)
            out = conv_a.noise(aligned_feat, noise=n_a)   # aligned + w*n
            out = conv_a.activate(out)
        elif ind is not None:
            # non-NOISE condition injection (reference model.py:560-566 +
            # feature_modulation L588-609). Only ADD is functional in the
            # reference's callback protocol. In that path the callback is
            # invoked from feature_modulation (NOT NoiseInjection), so the
            # noise_weight/noise kwargs are absent and default to
            # 1 / randn_like(image) (arch L233-234): condition =
            # aligned - gen + randn, i.e. out = aligned + randn — no learned
            # noise weight involved. SFT/FUSE crash on the reference's
            # [None, None] condition slots (SURVEY §2.1 latent bugs) and are
            # rejected here with a clear error.
            if mod_type != "ADD":
                raise NotImplementedError(
                    f"modulation_type={mod_type} SAMM injection is "
                    "non-functional in the reference (None condition slots); "
                    "use NOISE or ADD")
            out_a = conv_a(out, lats[:, i], noise=n_a)   # full styled conv
            mod = mdl.modulation[4 - ind]
            aligned_feat, align = mod(feat, lats[:, i], out_a,
                                      aligned_coarse=prev_align)
            n = jax.random.normal(mdl.make_rng("noise"), out_a.shape,
                                  out_a.dtype)
            cond = aligned_feat - out_a + n
            out = feature_modulation(out_a, (None, cond), mod_type="ADD")
        else:
            out = conv_a(out, lats[:, i], noise=n_a)
        if f_in_b is not None:
            out = (1.0 - feature_scale) * out + feature_scale * f_in_b.astype(out.dtype)
        out = conv_b(out, lats[:, i + 1], noise=n_b)
        skip = g.to_rgbs[idx](out, lats[:, i + 2], skip)
        return out, skip, align

    stage_fn = (nn.remat(stage, static_argnums=(10, 11, 12))
                if (_DECODE_REMAT and train) else stage)

    out = gen.const_input(b, lats.dtype)
    out = gen.conv1(out, lats[:, 0], noise=noise[0])
    skip = gen.to_rgb1(out, lats[:, 1])

    aligns = {}
    prev_align = None
    i = 1
    for idx in range(len(gen.to_rgbs)):
        if i in cond_layers:
            ind = cond_layers.index(i) + 1            # 1..4, 1 = 32px
            feat = feats_c[4 - ind]                   # feats[-ind]
        else:
            ind, feat = None, None
        f_in_a = (features_in or {}).get(i)
        f_in_b = (features_in or {}).get(i + 1)
        out, skip, align = stage_fn(arch, out, skip, prev_align, lats, feat,
                                    f_in_a, f_in_b, noise[1 + 2 * idx],
                                    noise[2 + 2 * idx], idx, i, ind)
        # spatial-partitioning anchor (no-op outside parallel.spatial):
        # H-shards the high-res tail; coarse/SAMM stages stay replicated
        out, skip = sp_constrain(out), sp_constrain(skip)
        if align is not None:
            aligns[ind] = align
            prev_align = align
        i += 2
    return skip, aligns


def blending_mask(aligns, out_size: int):
    """Composite per-scale alphas to the full-res OOD mask (arch L315-339)."""
    size = (out_size, out_size)
    alpha = None
    for k in sorted(k for k in aligns if isinstance(k, int) and k <= 4):
        a_k = resize_bilinear(aligns[k][..., 2:3], size)
        if alpha is None:
            alpha = a_k
        else:
            alpha = (a_k * alpha) + (alpha * (1.0 - alpha))
    return jnp.clip(alpha, 0.0, 1.0) if alpha is not None else None


def blend_and_pack(arch, x, gen_image, lats, aligns):
    """Blend OOD pixels over the inversion and pack the output dict.
    skip_SA (reference arch L300-303): the blended base is a detached plain
    decode; the SAMM-conditioned run still supplies the masks."""
    image = gen_image
    if getattr(arch, "skip_SA", False):
        image = jax.lax.stop_gradient(arch.generator(lats))
    mask = None
    if arch.blend_with_gen and aligns:
        mask = blending_mask(aligns, arch.out_size)
        aligns[arch.out_size] = jnp.tile(mask, (1, 1, 1, 3))
        for _ in range(arch.blend_cnt):
            image = mask * jax.lax.stop_gradient(x) + image * (1.0 - mask)
    return {"image": image, "lats": lats, "aligns": aligns, "mask": mask,
            "gen_image": gen_image}
