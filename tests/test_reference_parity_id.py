"""GOLDEN parity for the face-ID backbones against the ACTUAL reference.

Runs the reference torch modules from /root/reference/src/ops/face_id on
CPU with randomized weights, converts their real state_dicts, and asserts
the flax twins reproduce the embeddings. These are the nets behind the ID
loss (src/losses/id_loss.py:25 — IR-SE-50), the ID metric
(src/metrics/identity.py), and ArcFaceLoss (id_loss.py:109 — ResNetArcFace),
so this validates the exact converter paths real model_ir_se50.pth /
arcface_resnet18.pth files travel through.
"""

import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
sys.path.insert(0, "tools")

from ref_compat import load_reference_module, from_nhwc
from convert_torch_weights import (convert_irse50_backbone,
                                   convert_arcface_resnet)
from test_reference_parity import (perturb_state_dict, clean, unflatten,
                                   assert_tree_matches_init)


def test_irse50_backbone_golden():
    """Backbone(112, 50, 'ir_se') — model_irse.py:10-49. The ID loss/metric
    embedding net; 112x112 -> l2-normalized 512-d."""
    from ood_gan_inversion_tpu.nn.irse import ArcFaceBackbone

    m = load_reference_module("src.ops.face_id.model_irse")
    torch.manual_seed(0)
    ref = m.Backbone(input_size=112, num_layers=50, drop_ratio=0.6,
                     mode="ir_se")
    ref.eval()
    sd = perturb_state_dict(ref, seed=11)

    flat, leftovers = convert_irse50_backbone(sd)
    assert not leftovers, leftovers
    flat = clean(flat)

    net = ArcFaceBackbone()
    x = (np.random.RandomState(5).rand(2, 112, 112, 3).astype(np.float32)
         * 2 - 1)
    init = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert_tree_matches_init(flat, init["params"], "irse50")
    params = unflatten(flat)

    with torch.no_grad():
        ref_emb = ref(from_nhwc(x)).numpy()
    emb = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    # embeddings are l2-normalized; atol on the unit sphere is the metric
    np.testing.assert_allclose(emb, ref_emb, atol=2e-4, rtol=0)
    # and the downstream quantity, cosine similarity, must agree tightly
    cos_ref = (ref_emb[0] * ref_emb[1]).sum()
    cos = (emb[0] * emb[1]).sum()
    np.testing.assert_allclose(cos, cos_ref, atol=2e-5)


@pytest.mark.parametrize("use_se", [False, True])
def test_arcface_resnet_golden(use_se):
    """ResNetArcFace IRBlock[2,2,2,2] (arcface_arch.py:171-245): grayscale
    128px -> 512-d, incl. the shared-PReLU subtlety and the SE branch."""
    from ood_gan_inversion_tpu.nn.arcface_resnet import ResNetArcFace

    a = load_reference_module("src.ops.face_id.arcface_arch")
    torch.manual_seed(1)
    ref = a.ResNetArcFace(block="IRBlock", layers=(2, 2, 2, 2),
                          use_se=use_se)
    ref.eval()
    sd = perturb_state_dict(ref, seed=12)

    flat, leftovers = convert_arcface_resnet(sd)
    assert not leftovers, leftovers
    flat = clean(flat)

    net = ResNetArcFace(layers=(2, 2, 2, 2), use_se=use_se)
    x = (np.random.RandomState(6).rand(2, 128, 128, 1).astype(np.float32)
         * 2 - 1)
    init = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert_tree_matches_init(flat, init["params"], "arcface")
    params = unflatten(flat)

    with torch.no_grad():
        ref_emb = ref(from_nhwc(x)).numpy()
    emb = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    scale = np.abs(ref_emb).max()
    np.testing.assert_allclose(emb, ref_emb, atol=2e-4 * max(scale, 1.0),
                               rtol=0)
