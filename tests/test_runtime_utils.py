"""Coverage for the runtime layer: options parsing, image utils, checkpoint
round-trips, message logger."""

import os.path as osp

import numpy as np
import pytest
import yaml


def test_parse_options_force_yml_and_debug(tmp_path):
    from ood_gan_inversion_tpu.utils.options import parse_options
    cfg = {"name": "exp1", "model_type": "m", "manual_seed": 1,
           "datasets": {"train": {"type": "Face_Dataset"}},
           "train": {"total_iter": 100},
           "val": {"val_freq": 500}, "logger": {"print_freq": 50}}
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump(cfg))
    opt, parsed = parse_options(str(tmp_path), is_train=True, args=[
        "--opt", str(p), "--debug",
        "--force_yml", "train:total_iter=7", "datasets:train:gt_size=64"])
    assert opt["name"].startswith("debug_")
    assert opt["train"]["total_iter"] == 7
    assert opt["datasets"]["train"]["gt_size"] == 64
    assert opt["datasets"]["train"]["phase"] == "train"
    assert opt["logger"]["print_freq"] == 1          # debug shrink
    assert opt["path"]["models"].endswith("models")


def test_img_utils_roundtrip(tmp_path):
    from ood_gan_inversion_tpu.utils.img_util import (imread, imwrite,
                                                      tensor2img, img2input)
    rng = np.random.RandomState(0)
    img8 = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "a.png")
    imwrite(img8[..., ::-1], path)           # imwrite takes BGR
    back = imread(path)                       # RGB [0,1]
    np.testing.assert_allclose(back * 255, img8, atol=1)

    t = img2input(back, size=32)              # (1,32,32,3) in [-1,1]
    assert t.shape == (1, 32, 32, 3)
    out8 = tensor2img(t, rgb2bgr=False)
    np.testing.assert_allclose(out8, img8, atol=1)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from ood_gan_inversion_tpu.utils import checkpoint as ckpt
    tree = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(4)}
    path = str(tmp_path / "t1")
    assert ckpt.save_pytree(tree, path)
    back = ckpt.load_pytree(path)
    np.testing.assert_array_equal(np.asarray(back["a"]["w"]),
                                  np.asarray(tree["a"]["w"]))

    # auto-resume scan picks max iter
    for it in (3, 12, 7):
        ckpt.save_pytree(tree, str(tmp_path / f"state_{it}"))
    found, it = ckpt.find_resume_state(str(tmp_path))
    assert it == 12 and found.endswith("state_12")


def test_message_logger_formats(capsys):
    from ood_gan_inversion_tpu.utils.logger import MessageLogger, get_root_logger
    import logging
    logger = get_root_logger()
    opt = {"name": "expname", "logger": {"print_freq": 1},
           "train": {"total_iter": 10}}
    ml = MessageLogger(opt, start_iter=1)
    # must not raise; formats lr/eta/losses
    ml({"iter": 2, "epoch": 0, "lrs": [1e-4], "time": 0.5, "data_time": 0.1,
        "l_pix": 0.25})


def test_packed_file_client_keys(tmp_path):
    import cv2
    from ood_gan_inversion_tpu.runtime.packio import write_pack
    from ood_gan_inversion_tpu.data.file_client import FileClient
    items = []
    for i in range(3):
        ok, buf = cv2.imencode(".png", np.full((8, 8, 3), i, np.uint8))
        items.append((f"{i}.png", buf.tobytes()))
    pack = str(tmp_path / "d.ogipack")
    write_pack(pack, items)
    fc = FileClient("packed", db_path=pack)
    assert sorted(fc.backend.keys()) == ["0.png", "1.png", "2.png"]
    assert fc.get("1.png") == items[1][1]

def test_memcached_file_client_gate():
    """The memcached backend mirrors the reference's lazy-import gate
    (file_client.py:36-39): constructing it without the cluster-specific
    `mc` library raises an informative ImportError."""
    import pytest
    from ood_gan_inversion_tpu.data.file_client import FileClient
    with pytest.raises(ImportError, match="mc"):
        FileClient("memcached", server_list_cfg="/none", client_cfg="/none")


def test_init_state_routes_to_subprocess_on_accelerator(monkeypatch):
    """r4: on accelerator sessions (where in-process eager init hangs),
    init_state(seed=...) must delegate to the cached subprocess init; CPU
    sessions and seedless calls keep the in-process path."""
    import jax
    from ood_gan_inversion_tpu.models import build_model, ood_model
    from ood_gan_inversion_tpu.utils import host_init
    from tests.test_train_model import micro_opt

    called = {}

    def fake_state(opt, shape, seed):
        called["args"] = (tuple(shape), seed)
        return "SENTINEL_STATE"

    monkeypatch.setattr(host_init, "cpu_init_model_state", fake_state)
    monkeypatch.setattr(ood_model.jax, "default_backend", lambda: "axon")
    model = build_model(micro_opt())
    out = model.init_state(jax.random.PRNGKey(3), (1, 32, 32, 3), seed=3)
    assert out == "SENTINEL_STATE"
    assert called["args"] == ((1, 32, 32, 3), 3)
