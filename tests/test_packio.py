"""Native OGIPack reader vs pure-Python fallback parity + dataset backend."""

import os.path as osp

import numpy as np
import cv2
import pytest

from ood_gan_inversion_tpu.runtime.packio import (write_pack, PackReader,
                                                  build_native)
from ood_gan_inversion_tpu.data import build_dataset


@pytest.fixture(scope="module")
def pack_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("pack")
    rng = np.random.RandomState(0)
    items = []
    for i in range(5):
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        items.append((f"{i}.png", buf.tobytes()))
    out = str(d / "data.ogipack")
    n = write_pack(out, items)
    assert n == 5
    return out, items


def test_native_builds_and_matches_python(pack_file):
    path, items = pack_file
    so = build_native()
    assert osp.exists(so)
    nat = PackReader(path, native=True)
    py = PackReader(path, native=False)
    assert nat.native, "native .so should load"
    assert not py.native
    assert len(nat) == len(py) == 5
    for i in range(5):
        assert nat.name(i) == py.name(i) == items[i][0]
        assert nat.read(i) == py.read(i) == items[i][1]
        nat.prefetch(i)
    nat.close()
    py.close()


def test_face_dataset_packed_backend(pack_file):
    path, _ = pack_file
    ds = build_dataset({"type": "Face_Dataset", "dataroot_gt": path,
                        "io_backend": {"type": "packed"},
                        "mode": "mix_id", "gt_size": 32, "max_length": 1,
                        "phase": "train"})
    assert len(ds) == 5
    item = ds[2]
    assert item["gt"].shape == (1, 32, 32, 3)
    assert item["gt_path"] == ["2.png"]
