"""Test pipeline (reference BasicSR/basicsr/test.py:11-40): options ->
loaders -> validation per test set."""

import os.path as osp
import time

import jax

from .utils.options import parse_options, make_exp_dirs
from .utils.logger import get_root_logger
from .data import build_dataset, build_dataloader
from .models import build_model
from .models.validation import run_validation
from .train import load_pretrained


def test_pipeline(root_path, args=None):
    opt, parsed = parse_options(root_path, is_train=False, args=args)
    make_exp_dirs(opt)
    log_file = osp.join(opt["path"]["log"],
                        f"test_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_file=log_file)

    loaders = []
    for phase, dataset_opt in sorted((opt.get("datasets") or {}).items()):
        ds = build_dataset(dataset_opt)
        loaders.append((dataset_opt.get("name", phase),
                        build_dataloader(ds, dataset_opt, is_train=False)))
        logger.info(f"Test images in {dataset_opt.get('name', phase)}: {len(ds)}")

    model = build_model(opt)
    gt_size = next(iter(opt["datasets"].values())).get("gt_size", 1024)
    state = model.init_state(jax.random.PRNGKey(opt.get("manual_seed", 0)),
                             (1, gt_size, gt_size, 3),
                             seed=opt.get("manual_seed", 0))
    p = (opt.get("path", {}) or {}).get("pretrain_network_g")
    if p:
        state = load_pretrained(model, state, p, "g",
                                opt["path"].get("param_key_g", "params"),
                                strict=opt["path"].get("strict_load_g", False))

    results = {}
    for name, loader in loaders:
        logger.info(f"Testing {name}...")
        results[name] = run_validation(model, state, loader, opt,
                                       current_iter=0, ema=False)
    return results
