"""Inversion engine tests on a tiny CPU config: YAML -> engine -> editing
direction -> per-image outputs + report, and the converted-npz loading path
of the train pipeline."""

import os.path as osp

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("inv_imgs")
    rng = np.random.RandomState(0)
    for i in range(2):
        cv2.imwrite(str(d / f"{i}.png"), (rng.rand(64, 64, 3) * 255).astype(np.uint8))
    return str(d)


def tiny_opt(img_dir):
    return {
        "name": "inv_tiny",
        "network_g": {"type": "ood_faceGAN_e4e", "out_size": 64,
                      "channel_multiplier": 1, "cycle_align": 1,
                      "warp_scale": 0.08, "ModSize": 64},
        "datasets": {"test_1": {"name": "t", "dataroot_gt": img_dir}},
        "val": {"metrics": {
            "psnr": {"type": "calculate_psnr", "crop_border": 2,
                     "test_y_channel": True, "better": "higher"}}},
    }


def test_run_inversion_end_to_end(img_dir, tmp_path):
    from ood_gan_inversion_tpu.infer import run_inversion
    out_dir = str(tmp_path / "out")
    report = run_inversion(tiny_opt(img_dir), out_dir)
    assert report["images"] == 2
    assert "psnr" in report and np.isfinite(report["psnr"])
    assert osp.exists(osp.join(out_dir, "inversion", "0.png"))
    assert osp.exists(osp.join(out_dir, "masks", "0_64.png"))  # composite


def test_engine_editing_direction_changes_output(img_dir):
    from ood_gan_inversion_tpu.infer import InversionEngine
    from ood_gan_inversion_tpu.utils.img_util import imread
    eng = InversionEngine(tiny_opt(img_dir))
    img = imread(osp.join(img_dir, "0.png"))
    rng = jax.random.PRNGKey(0)
    out0 = np.asarray(eng.invert(img, rng)["gen_image"])
    eng.apply_direction(np.full((10, 512), 0.2, np.float32))
    out1 = np.asarray(eng.invert(img, rng)["gen_image"])
    assert np.abs(out1 - out0).max() > 1e-4


def test_load_pretrained_npz_roundtrip(tmp_path):
    """Converter-npz -> load_pretrained -> forward (the YAML weight path)."""
    from flax import traverse_util
    from ood_gan_inversion_tpu.models import build_model
    from ood_gan_inversion_tpu.train import load_pretrained
    from tests.test_train_model import micro_opt, make_batch

    model = build_model(micro_opt())
    state = model.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3))

    # fake a converted checkpoint: the full net_g tree with shifted values
    from ood_gan_inversion_tpu.models.ood_model import merge_params
    full = merge_params(state.params_g_train, state.params_g_frozen)
    flat = traverse_util.flatten_dict(full, sep="/")
    shifted = {k: np.asarray(v) + 0.001 for k, v in flat.items()}
    npz_path = str(tmp_path / "conv.npz")
    np.savez(npz_path, **shifted)

    state2 = load_pretrained(model, state, npz_path, "g", strict=False)
    new_flat = traverse_util.flatten_dict(
        merge_params(state2.params_g_train, state2.params_g_frozen), sep="/")
    k0 = sorted(flat)[0]
    np.testing.assert_allclose(np.asarray(new_flat[k0]),
                               np.asarray(flat[k0]) + 0.001, rtol=1e-6)

    out = model.infer(state2, jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["image"])).all()


def test_invert_spatial_default_mesh_does_not_retrace(img_dir):
    """The spatial-sharded forward caches on Mesh equality: the default-mesh
    path builds a fresh (but equal) Mesh per call and must NOT retrace
    (a retrace is a ~25 s remote recompile per image on the axon backend)."""
    from ood_gan_inversion_tpu.infer import InversionEngine
    from ood_gan_inversion_tpu.utils.img_util import imread

    eng = InversionEngine(tiny_opt(img_dir))
    img = imread(osp.join(img_dir, "0.png"))
    o1 = eng.invert_spatial(img, jax.random.PRNGKey(0))
    fwd1 = eng._sp_fwd
    o2 = eng.invert_spatial(img, jax.random.PRNGKey(0))
    assert eng._sp_fwd is fwd1          # same compiled fn object
    assert fwd1._cache_size() == 1       # and exactly one trace in its cache
    np.testing.assert_allclose(np.asarray(o1["image"]),
                               np.asarray(o2["image"]), atol=1e-6)


def test_invert_batch_perkey_slot_independent(img_dir):
    """Per-sample-key batched inversion: a sample's output must not depend on
    its slot or on the batch size (the serving determinism contract)."""
    from ood_gan_inversion_tpu.infer import InversionEngine
    from ood_gan_inversion_tpu.utils.img_util import imread

    eng = InversionEngine(tiny_opt(img_dir))
    a = imread(osp.join(img_dir, "0.png"))
    b = imread(osp.join(img_dir, "1.png"))
    k = np.asarray(jax.random.PRNGKey(0))
    solo = eng.invert_batch_perkey([a], k[None])
    quad = eng.invert_batch_perkey([b, b, b, a], np.stack([k] * 4))
    np.testing.assert_allclose(np.asarray(quad["image"][3]),
                               np.asarray(solo["image"][0]), atol=1e-5)


def test_invert_batch_sharded_over_mesh(img_dir):
    """Sharded batch inversion over the virtual 8-device mesh must match the
    per-image path."""
    import jax
    from ood_gan_inversion_tpu.infer import InversionEngine
    from ood_gan_inversion_tpu.parallel import make_mesh
    from ood_gan_inversion_tpu.utils.img_util import imread

    eng = InversionEngine(tiny_opt(img_dir))
    imgs = [imread(osp.join(img_dir, f"{i}.png")) for i in range(2)] * 4  # 8
    mesh = make_mesh(jax.devices())
    rng = jax.random.PRNGKey(0)
    out = eng.invert_batch_sharded(imgs, rng, mesh=mesh)
    assert out["image"].shape == (8, 64, 64, 3)
    assert np.isfinite(np.asarray(out["image"])).all()
