"""GOLDEN rehearsal of the full eval protocol against the ACTUAL reference.

The forward/metric internals are golden elsewhere; the seam this closes is
the EVAL LOOP itself (run_ood_faceGAN_inversion.py:89-124, 126-191): image
IO conventions (cv2 BGR, uint8 round trips), metric dispatch with the YAML
crop_border/test_y_channel knobs (including the reference's quirk of
SWALLOWING them for identity), the per-image accumulation and averaging,
and the drop-in .pth contract (a fabricated random model_ir_se50.pth
travels the reference's torch loader on one side and our converter on the
other). So real pretrained .pth files become a pure drop-in.

LPIPS is excluded: the `lpips` pip package is absent in this image, so the
reference's calculate_lpips cannot construct its net here; our LPIPS
protocol (net + quirks) is pinned separately by tests/test_lpips_oracle.py.
"""

import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from ref_compat import (install_reference_stubs, load_real_basicsr,
                        load_reference_module, REFERENCE_ROOT)


@pytest.fixture(scope="module")
def ref_eval():
    """The reference's ACTUAL eval() with its real metric implementations."""
    install_reference_stubs()
    # real BasicSR metric code under the stubbed package
    load_real_basicsr("basicsr.utils.matlab_functions")
    load_real_basicsr("basicsr.metrics.metric_util")
    psnr_ssim = load_real_basicsr("basicsr.metrics.psnr_ssim")
    bm = sys.modules.setdefault("basicsr.metrics",
                                type(sys)("basicsr.metrics"))
    bm.calculate_psnr = psnr_ssim.calculate_psnr
    bm.calculate_ssim = psnr_ssim.calculate_ssim
    sys.modules["basicsr"].metrics = bm
    # the run script imports tensor2img/img2tensor and make_grid via
    # torchvision; wire the real img_util under the stubs
    sys.modules["torchvision.utils"].make_grid = lambda *a, **k: a[0]
    img_util = load_real_basicsr("basicsr.utils.img_util")
    bu = sys.modules["basicsr.utils"]
    bu.tensor2img = img_util.tensor2img
    bu.img2tensor = img_util.img2tensor
    # real src.metrics (identity; lpips module imports the stubbed pip pkg
    # lazily so importing it is safe as long as calculate_lpips isn't called)
    load_reference_module("src.metrics")
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "ref_run_inversion", f"{REFERENCE_ROOT}/run_ood_faceGAN_inversion.py")
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def irse50_pth(tmp_path_factory):
    """Fabricated random model_ir_se50.pth — the file both stacks load."""
    import torch
    m = load_reference_module("src.ops.face_id.model_irse")
    torch.manual_seed(7)
    ref = m.Backbone(input_size=112, num_layers=50, drop_ratio=0.6,
                     mode="ir_se")
    sd = ref.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            g = torch.Generator().manual_seed(hash(k) % (2 ** 31))
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
        # BatchNorm running_var must stay positive
        if k.endswith("running_var"):
            sd[k] = sd[k].abs() + 0.5
    path = tmp_path_factory.mktemp("weights") / "model_ir_se50.pth"
    torch.save(sd, str(path))
    return str(path)


def _write_images(folder, n=2, size=256, seed=3):
    import cv2
    os.makedirs(folder, exist_ok=True)
    rs = np.random.RandomState(seed)
    paths = []
    for i in range(n):
        # smooth-ish synthetic faces-shaped content (pure noise makes SSIM
        # degenerate); upscale a low-res draw
        low = rs.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        img = cv2.resize(low, (size, size), interpolation=cv2.INTER_CUBIC)
        p = osp.join(folder, f"{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_eval_protocol_golden(ref_eval, irse50_pth, tmp_path):
    """Our run_inversion report == the reference eval() loop's averages on
    the same (gt, inversion) pairs, metric for metric."""
    import cv2
    from ood_gan_inversion_tpu.infer import run_inversion
    from ood_gan_inversion_tpu.metrics.identity import _IDModel

    size = 256
    data_dir = str(tmp_path / "imgs")
    out_dir = str(tmp_path / "results")
    files = _write_images(data_dir, n=2, size=size)

    # ---- our stack: tiny random model, reference-mirrored metric YAML ----
    _IDModel._instance = None  # isolate the metric singleton
    _IDModel._instance_path = None
    opt = {
        "name": "evalproto",
        "network_g": {
            "type": "ood_faceGAN_e4e", "out_size": size, "style_dim": 512,
            "channel_multiplier": 1, "encoder": "E4E",
            "encoder_num_layers": 4, "enable_modulation": True,
            "modulation_type": "NOISE", "warp_scale": 0.08,
            "cycle_align": 1, "blend_with_gen": True,
            "ModSize": 64,
        },
        "datasets": {"celeba": {"dataroot_gt": data_dir}},
        "val": {"metrics": {
            # the reference protocol block (options/test/E4E_Face_test.yml:
            # 39-53) verbatim, plus our registry dispatch keys
            "psnr": {"type": "calculate_psnr", "crop_border": 2,
                     "test_y_channel": False},
            "ssim": {"type": "calculate_ssim", "crop_border": 2,
                     "test_y_channel": False},
            "identity": {"type": "calculate_identity", "crop_border": 2,
                         "test_y_channel": False,
                         "model_path": irse50_pth},
        }},
    }
    report = run_inversion(opt, out_dir)
    assert report["images"] == len(files)

    # ---- reference stack: the ACTUAL eval() on the same image pairs ----
    metrics_opt = {
        "psnr": {"crop_border": 2, "test_y_channel": False},
        "ssim": {"crop_border": 2, "test_y_channel": False},
        "identity": {"crop_border": 2, "test_y_channel": False,
                     "model_path": irse50_pth},
        # no "lpips" key -> the reference appends 0 to metrics['identity']
        # (eval()'s copy-paste quirk, run_ood_faceGAN_inversion.py:104-106)
    }
    # reset the reference's metric singleton so it loads OUR fabricated pth
    sys.modules["src.metrics.identity"].id_loss = None
    metrics = None
    for f in files:
        cv2im = cv2.imread(f) / 255.0
        base = osp.splitext(osp.basename(f))[0]
        result = cv2.imread(osp.join(out_dir, "inversion", f"{base}.png"))
        assert result is not None
        metrics = ref_eval.eval(cv2im * 255.0, result.astype(np.float64),
                                metrics, metrics_opt)

    # the reference averages each list (run_ood_faceGAN_inversion.py:185-190);
    # the missing-lpips quirk pushes zeros into 'identity', so compare the
    # identity metric on its per-image values
    ref_psnr = float(np.mean(metrics["psnr"]))
    ref_ssim = float(np.mean(metrics["ssim"]))
    id_vals = [v for v in metrics["identity"] if v != 0]
    assert len(id_vals) == len(files)
    ref_id = float(np.mean(id_vals))

    np.testing.assert_allclose(report["psnr"], ref_psnr, rtol=1e-6)
    np.testing.assert_allclose(report["ssim"], ref_ssim, rtol=1e-6)
    # identity crosses two frameworks' conv stacks (torch vs XLA CPU) on a
    # random-weight backbone; embeddings match to ~1e-4 on the unit sphere
    np.testing.assert_allclose(report["identity"], ref_id, atol=2e-3)
