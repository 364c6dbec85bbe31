"""End-to-end pipeline smoke test: synthetic dataset -> train_pipeline for a
few iters (ckpt save + validation + resume) — the whole experiment runtime."""

import os
import os.path as osp
import shutil

import numpy as np
import cv2
import pytest

import jax


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("ood_micro_data")
    rng = np.random.RandomState(0)
    for i in range(6):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"{i}.png"), img)
    return str(d)


def test_dataset_and_loader(synth_data):
    from ood_gan_inversion_tpu.data import build_dataset, build_dataloader
    ds = build_dataset({"type": "Face_Dataset", "dataroot_gt": synth_data,
                        "mode": "mix_id", "gt_size": 64, "max_length": 2,
                        "use_hflip": True, "phase": "train"})
    assert len(ds) == 6
    item = ds[0]
    assert item["gt"].shape == (2, 64, 64, 3)
    assert item["gt"].min() >= -1.0 and item["gt"].max() <= 1.0
    loader = build_dataloader(ds, {"batch_size_per_gpu": 2,
                                   "num_worker_per_gpu": 2,
                                   "dataset_enlarge_ratio": 2,
                                   "use_shuffle": True}, is_train=True)
    batches = list(loader)
    assert len(batches) == len(loader)
    assert batches[0]["gt"].shape == (2, 2, 64, 64, 3)
    assert batches[0]["lq_size"].shape == (2, 2)


def test_sharded_sampler_partition():
    from ood_gan_inversion_tpu.data.loader import EnlargedSampler
    all_idx = []
    for shard in range(4):
        s = EnlargedSampler(10, num_shards=4, shard_index=shard, ratio=2,
                            seed=7)
        idx = list(s)
        assert len(idx) == len(s)
        all_idx.extend(idx)
    assert len(all_idx) == 20  # ratio * dataset, exact cover across shards


def test_train_pipeline_end_to_end(synth_data, tmp_path):
    from ood_gan_inversion_tpu.train import train_pipeline
    args = ["--opt", "options/train/micro_debug.yml",
            "--force_yml",
            f"datasets:train:dataroot_gt={synth_data}",
            f"datasets:val:dataroot_gt={synth_data}",
            f"path:experiments_root={tmp_path}/exp",
            "train:total_iter=4",
            "val:val_freq=4",
            "logger:save_checkpoint_freq=4"]
    state = train_pipeline(str(tmp_path), args=args)
    assert int(jax.device_get(state.step)) == 4
    # checkpoint written
    assert osp.isdir(f"{tmp_path}/exp/training_states/state_4")
    assert osp.isdir(f"{tmp_path}/exp/models/net_4")
    # validation wrote an inversion image
    vis = f"{tmp_path}/exp/visualization"
    assert os.listdir(vis)

    # resume continues from iter 4
    args_resume = ["--auto_resume"] + [
        a.replace("train:total_iter=4", "train:total_iter=6") for a in args]
    state2 = train_pipeline(str(tmp_path), args=args_resume)
    assert int(jax.device_get(state2.step)) == 6


def test_test_pipeline_end_to_end(synth_data, tmp_path):
    from ood_gan_inversion_tpu.test import test_pipeline
    import yaml
    cfg = {
        "name": "micro_test",
        "model_type": "ood_faceGAN_Model",
        "manual_seed": 0,
        "is_mimo": True,
        "datasets": {"test_1": {"name": "synthetic", "type": "Face_Dataset",
                                "dataroot_gt": synth_data, "mode": "mix_id",
                                "gt_size": 64, "max_length": 1,
                                "mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]}},
        "network_g": {"type": "ood_faceGAN_e4e", "out_size": 64,
                      "style_dim": 512, "channel_multiplier": 1,
                      "enable_modulation": True, "modulation_type": "NOISE",
                      "warp_scale": 0.08, "cycle_align": 1,
                      "blend_with_gen": True, "ModSize": 64,
                      "stage": "Inference"},
        "path": {"results_root": str(tmp_path / "results")},
        "val": {"save_img": True,
                "metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 2,
                                     "test_y_channel": True,
                                     "better": "higher"}}},
    }
    p = tmp_path / "test.yml"
    p.write_text(yaml.safe_dump(cfg))
    results = test_pipeline(str(tmp_path), args=["--opt", str(p)])
    assert "synthetic" in results
    assert "psnr" in results["synthetic"]
    assert np.isfinite(results["synthetic"]["psnr"])
