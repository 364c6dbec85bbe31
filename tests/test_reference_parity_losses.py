"""GOLDEN loss parity against the ACTUAL reference loss implementations.

Runs /root/reference's src/losses/{mask_loss,id_loss}.py on CPU (torch) and
asserts our registry losses reproduce them — including the IR-SE-50 ID
backbone travelling through the real weight converter (the same path
model_ir_se50.pth takes), and the MIMO cross-output reference term's
argmax/argmin column selection (src/losses/id_loss.py:64-87).
"""

import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
sys.path.insert(0, "tools")

from ref_compat import load_reference_module
from test_reference_parity import perturb_state_dict, clean, unflatten
from convert_torch_weights import convert_irse50_backbone


def to_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


# ------------------------------------------------------------------ mask loss

def test_mask_loss_golden():
    ref_mod = load_reference_module("src.losses.mask_loss")
    cfg = {"binary": [16], "area": {"16": 0.2, "8": 0.05},
           "target": 0, "binary_weight": 0.5}
    ref = ref_mod.MaskLoss(loss_weight=1.3, loss_func=dict(cfg))

    from ood_gan_inversion_tpu.losses.mask_loss import MaskLoss
    ours = MaskLoss(loss_weight=1.3, loss_func=dict(cfg))

    rs = np.random.RandomState(0)
    aligns_np = {s: rs.rand(2, s, s, 3).astype(np.float32)
                 for s in (16, 8)}
    r_bin, r_area = ref({k: to_nchw(v) for k, v in aligns_np.items()})
    o_bin, o_area = ours({k: jnp.asarray(v) for k, v in aligns_np.items()})
    np.testing.assert_allclose(float(o_bin), float(r_bin), rtol=1e-5)
    np.testing.assert_allclose(float(o_area), float(r_area), rtol=1e-5)

    # target=1: no mask inversion before the area hinge
    cfg1 = dict(cfg, target=1)
    r_bin, r_area = ref_mod.MaskLoss(loss_func=dict(cfg1))(
        {k: to_nchw(v) for k, v in aligns_np.items()})
    o_bin, o_area = MaskLoss(loss_func=dict(cfg1))(
        {k: jnp.asarray(v) for k, v in aligns_np.items()})
    np.testing.assert_allclose(float(o_bin), float(r_bin), rtol=1e-5)
    np.testing.assert_allclose(float(o_area), float(r_area), rtol=1e-5)


# -------------------------------------------------------------------- id loss

@pytest.fixture(scope="module")
def id_pair():
    """(reference IDLoss with perturbed backbone, our IDLoss + params)."""
    ref_irse = load_reference_module("src.ops.face_id.model_irse")
    backbone = ref_irse.Backbone(input_size=112, num_layers=50,
                                 drop_ratio=0.6, mode="ir_se")
    sd = perturb_state_dict(backbone, seed=21)

    ref_mod = load_reference_module("src.losses.id_loss")
    ref = ref_mod.IDLoss(ckpt_dict=sd, device="cpu",
                         loss_weight=0.7, ref_loss_weight=0.4)
    ref.eval()

    from ood_gan_inversion_tpu.losses.id_loss import IDLoss
    ours = IDLoss(loss_weight=0.7, ref_loss_weight=0.4)
    sd_np = {k: v.numpy() for k, v in sd.items()}
    flat, leftovers = convert_irse50_backbone(sd_np)
    assert not leftovers, leftovers[:8]
    params = {"params": unflatten(clean(flat))}
    return ref, ours, params


def test_id_backbone_golden(id_pair):
    ref, ours, params = id_pair
    rs = np.random.RandomState(3)
    x = rs.randn(2, 112, 112, 3).astype(np.float32) * 0.4
    with torch.no_grad():
        e_ref = ref.facenet(to_nchw(x)).numpy()
    e_ours = np.asarray(ours.facenet.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(e_ours, e_ref, rtol=5e-3, atol=5e-4)


def test_id_loss_golden_nonmimo(id_pair):
    ref, ours, params = id_pair
    rs = np.random.RandomState(4)
    mk = lambda: rs.randn(2, 256, 256, 3).astype(np.float32) * 0.3
    y_hat, y, x = mk(), mk(), mk()
    with torch.no_grad():
        r_loss, _, _ = ref(to_nchw(y_hat), to_nchw(y), to_nchw(x))
    o_loss, _ = ours(params, jnp.asarray(y_hat), jnp.asarray(y),
                     jnp.asarray(x))
    np.testing.assert_allclose(float(o_loss), float(r_loss),
                               rtol=5e-3, atol=1e-4)


def test_id_loss_golden_mimo(id_pair):
    ref, ours, params = id_pair
    for seed in (5, 6):
        rs = np.random.RandomState(seed)
        b, k = 1, 3
        mk = lambda: rs.randn(b, k, 256, 256, 3).astype(np.float32) * 0.3
        y_hat, y, x = mk(), mk(), mk()
        score = rs.rand(b, k).astype(np.float32)
        tt = lambda v: torch.from_numpy(
            np.transpose(v, (0, 1, 4, 2, 3)).copy())
        with torch.no_grad():
            r_loss, r_ref, _ = ref(tt(y_hat), tt(y), tt(x), mimo_id=True,
                                   score=torch.from_numpy(score))
        o_loss, o_ref = ours(params, jnp.asarray(y_hat), jnp.asarray(y),
                             jnp.asarray(x), mimo_id=True,
                             score=jnp.asarray(score))
        np.testing.assert_allclose(float(o_loss), float(r_loss),
                                   rtol=5e-3, atol=1e-4)
        np.testing.assert_allclose(float(o_ref), float(r_ref),
                                   rtol=5e-3, atol=1e-4)
