"""Numeric LPIPS verification against a plain-torch oracle of the `lpips`
pip package (richzhang/PerceptualSimilarity, the exact dependency the
reference wraps at src/metrics/lpips.py:1-76 and src/losses/lpips_loss.py:
13-34 — the package itself is not installed in this image, so the oracle
re-states its alex forward in plain torch: ScalingLayer shift/scale,
torchvision-AlexNet feature taps after each of the 5 ReLUs, channel
unit-normalize, squared diff, non-negative 1x1 lin weights, spatial mean,
layer sum).

Random torchvision-named state dicts go through convert_lpips_alex, so this
pins the converter mapping AND the flax net numerics; the metric/loss tests
below additionally pin the reference's protocol quirks (np2tensor's
x*2/255 - 0.5 range, the double-normalize in LPIPS_Loss).
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

from test_reference_parity import unflatten, assert_tree_matches_init
from convert_torch_weights import convert_lpips_alex

from ood_gan_inversion_tpu.nn.lpips import LPIPS

SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

# torchvision alexnet.features layout: (conv idx, out_ch, k, s, p, pool_after)
ALEX = [(0, 64, 11, 4, 2, True), (3, 192, 5, 1, 2, True),
        (6, 384, 3, 1, 1, False), (8, 256, 3, 1, 1, False),
        (10, 256, 3, 1, 1, False)]


class TorchAlexLPIPS(torch.nn.Module):
    """lpips.LPIPS(net='alex') forward, restated without torchvision."""

    def __init__(self):
        super().__init__()
        convs = []
        cin = 3
        for _, ch, k, s, p, _ in ALEX:
            convs.append(torch.nn.Conv2d(cin, ch, k, stride=s, padding=p))
            cin = ch
        self.convs = torch.nn.ModuleList(convs)
        self.pool = torch.nn.MaxPool2d(3, 2)
        # lpips lin layers: 1x1 conv, no bias, weights kept non-negative
        self.lins = torch.nn.ModuleList(
            [torch.nn.Conv2d(ch, 1, 1, bias=False) for _, ch, *_ in ALEX])
        for lin in self.lins:
            with torch.no_grad():
                lin.weight.abs_()

    def features(self, x):
        feats = []
        for i, (conv, (_, _, _, _, _, pool)) in enumerate(
                zip(self.convs, ALEX)):
            x = torch.relu(conv(x))
            feats.append(x)
            if pool:
                x = self.pool(x)
        return feats

    def forward(self, a, b):
        a = (a - SHIFT) / SCALE
        b = (b - SHIFT) / SCALE
        total = 0.0
        for fa, fb, lin in zip(self.features(a), self.features(b), self.lins):
            na = fa / (fa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = fb / (fb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = lin((na - nb).pow(2))
            total = total + d.mean(dim=(2, 3))
        return total.view(-1)

    def state_dicts(self):
        """(torchvision-alexnet-named sd, lpips-package-named sd)."""
        alex_sd = {}
        for (idx, *_), conv in zip(ALEX, self.convs):
            alex_sd[f"features.{idx}.weight"] = conv.weight.detach()
            alex_sd[f"features.{idx}.bias"] = conv.bias.detach()
        lpips_sd = {f"lin{i}.model.1.weight": lin.weight.detach()
                    for i, lin in enumerate(self.lins)}
        return alex_sd, lpips_sd


@pytest.fixture(scope="module")
def lpips_pair():
    torch.manual_seed(7)
    oracle = TorchAlexLPIPS().eval()
    alex_sd, lpips_sd = oracle.state_dicts()
    flat, leftovers = convert_lpips_alex(alex_sd, lpips_sd)
    assert not leftovers

    net = LPIPS()
    z = jnp.zeros((1, 64, 64, 3))
    init = jax.device_get(net.init(jax.random.PRNGKey(0), z, z))["params"]
    assert_tree_matches_init(flat, init, "lpips_alex")
    params = {"params": unflatten(flat)}
    return oracle, net, params


def test_lpips_net_matches_torch_oracle(lpips_pair):
    oracle, net, params = lpips_pair
    rs = np.random.RandomState(3)
    a = rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    b = rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = oracle(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                     torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(net.apply(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_lpips_metric_mirrors_reference_protocol(lpips_pair):
    """calculate_lpips must reproduce src/metrics/lpips.py exactly: crop
    border, then np2tensor's x*2/255 - 0.5 (NOT [-1,1]), channels fed in
    tensor2img's BGR order un-flipped."""
    oracle, _, params = lpips_pair
    from ood_gan_inversion_tpu.metrics.lpips import (calculate_lpips,
                                                     LPIPSModel)
    LPIPSModel.instance(params)
    rs = np.random.RandomState(4)
    img = (rs.rand(70, 70, 3) * 255).astype(np.uint8)
    img2 = (rs.rand(70, 70, 3) * 255).astype(np.uint8)

    def ref_metric(x, y, crop):
        x = x[crop:-crop, crop:-crop].astype(np.float32)
        y = y[crop:-crop, crop:-crop].astype(np.float32)
        t = lambda z: torch.from_numpy(
            (z * 2 / 255.0 - 0.5).transpose(2, 0, 1)[None]).float()
        with torch.no_grad():
            return float(oracle(t(x), t(y))[0])

    ours = calculate_lpips(img, img2, crop_border=2)
    np.testing.assert_allclose(ours, ref_metric(img, img2, 2),
                               rtol=1e-4, atol=1e-5)

    # strict_shape=False crops to the common extent (lpips.py:34-40)
    ours2 = calculate_lpips(img, img2[:66, :68], crop_border=2,
                            strict_shape=False)
    np.testing.assert_allclose(
        ours2, ref_metric(img[:66, :68], img2[:66, :68], 2),
        rtol=1e-4, atol=1e-5)


def test_lpips_loss_mirrors_reference_double_normalize(lpips_pair):
    """LPIPS_Loss with min_max=(0,1) on [-1,1] inputs reaches the net in
    [-3,1] (the reference's normalize-twice quirk) — mirror, don't fix."""
    oracle, _, params = lpips_pair
    from ood_gan_inversion_tpu.losses import build_loss
    loss = build_loss({"type": "LPIPS_Loss", "loss_weight": 2.0})
    rs = np.random.RandomState(5)
    a = rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    b = rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = oracle(
            torch.from_numpy((a * 2 - 1).transpose(0, 3, 1, 2)),
            torch.from_numpy((b * 2 - 1).transpose(0, 3, 1, 2))
        ).mean().item() * 2.0
    ours, _ = loss(params, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4, atol=1e-5)
