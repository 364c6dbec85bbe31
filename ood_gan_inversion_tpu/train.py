"""Training pipeline (reference BasicSR/basicsr/train.py:91-210, re-founded):
one process per host, all local devices driven by a single jitted train step
over a data mesh. No launcher/rank plumbing — `jax.distributed.initialize`
covers multi-host when the standard TPU env is present.
"""

import os.path as osp
import time

import numpy as np
import jax

from .utils.options import parse_options, copy_opt_file, make_exp_dirs
from .utils.logger import (get_root_logger, MessageLogger, AvgTimer,
                           init_tb_logger, init_wandb_logger)
from .utils import checkpoint as ckpt
from .data import build_dataset, build_dataloader
from .models import build_model
from .models.ood_model import multistep_lr
from .models.validation import run_validation, BestMetricTracker
from .parallel import make_mesh, shard_batch, replicate_sharding


def maybe_init_distributed():
    """Multi-host init when launched on a TPU pod slice; harmless no-op
    single-host."""
    import os
    if os.environ.get("OOD_TPU_MULTIHOST", "0") == "1":
        jax.distributed.initialize()


def local_mesh_devices(opt):
    """Devices used by this process's mesh. `num_devices` (the reference's
    `num_gpu` analogue) caps it; the per-host batch is
    batch_size_per_gpu * len(devices)."""
    devs = jax.local_devices()
    n = opt.get("num_devices") or len(devs)
    return devs[:n]


def create_train_val_dataloader(opt, logger):
    train_loader, val_loader = None, None
    n_proc = jax.process_count()
    n_dev = len(local_mesh_devices(opt))
    for phase, dataset_opt in (opt.get("datasets") or {}).items():
        if phase == "train":
            ds = build_dataset(dataset_opt)
            dataset_opt = dict(dataset_opt)
            dataset_opt["batch_size_per_gpu"] = (
                dataset_opt.get("batch_size_per_gpu", 1) * n_dev)
            train_loader = build_dataloader(
                ds, dataset_opt, num_shards=n_proc,
                shard_index=jax.process_index(),
                seed=opt.get("manual_seed", 0), is_train=True)
            logger.info(f"Training images: {len(ds)}; "
                        f"{len(train_loader)} iters/epoch/process")
        elif phase.startswith("val"):
            ds = build_dataset(dataset_opt)
            val_loader = build_dataloader(ds, dataset_opt, is_train=False)
            logger.info(f"Validation images: {len(ds)}")
    return train_loader, val_loader


def train_pipeline(root_path, args=None):
    opt, parsed = parse_options(root_path, is_train=True, args=args)
    maybe_init_distributed()

    make_exp_dirs(opt)
    copy_opt_file(parsed.opt, opt["path"]["experiments_root"])
    log_file = osp.join(opt["path"]["log"],
                        f"train_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_file=log_file)
    logger.info(f"devices: {jax.devices()}")
    if opt.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)  # SURVEY §5.2 analogue
    tb_logger = (init_tb_logger(osp.join(opt["path"]["experiments_root"],
                                         "tb_logger"))
                 if (opt.get("logger", {}) or {}).get("use_tb_logger") else None)
    if (opt.get("logger", {}) or {}).get("wandb"):
        init_wandb_logger(opt)

    train_loader, val_loader = create_train_val_dataloader(opt, logger)

    model = build_model(opt)
    gt_size = opt["datasets"]["train"].get("gt_size", 1024)
    n_dev = len(local_mesh_devices(opt))
    batch = opt["datasets"]["train"].get("batch_size_per_gpu", 1) * n_dev
    k = opt["datasets"]["train"].get("max_length", 1)
    rng = jax.random.PRNGKey(opt.get("manual_seed", 0))
    state = model.init_state(rng, (batch * k, gt_size, gt_size, 3),
                             seed=opt.get("manual_seed", 0))

    # pretrained / converted weights
    path_opt = opt.get("path", {}) or {}
    for key, field in (("pretrain_network_g", "g"), ("pretrain_network_d", "d"),
                       ("pretrain_network_d2", "d2")):
        p = path_opt.get(key)
        if p:
            state = load_pretrained(model, state, p, field,
                                    path_opt.get(f"param_key_{field}", "params"),
                                    strict=path_opt.get(f"strict_load_{field}", True))
            logger.info(f"Loaded pretrained {field} from {p}")

    start_iter = 0
    if opt.get("auto_resume"):
        restored, it = ckpt.resume_training_state(
            state, opt["path"]["training_states"])
        if restored is not None:
            state = restored
            start_iter = it
            logger.info(f"Resumed training from iter {it}.")

    mesh = make_mesh(local_mesh_devices(opt))
    state = jax.device_put(state, replicate_sharding(mesh))

    total_iter = int(opt["train"]["total_iter"])
    print_freq = (opt.get("logger", {}) or {}).get("print_freq", 100)
    save_freq = (opt.get("logger", {}) or {}).get("save_checkpoint_freq", 2000)
    val_freq = (opt.get("val", {}) or {}).get("val_freq", None)
    tracker = BestMetricTracker((opt.get("val", {}) or {}).get("metrics"))

    msg_logger = MessageLogger(opt, start_iter + 1, tb_logger)
    iter_timer, data_timer = AvgTimer(), AvgTimer()
    sched = opt["train"].get("scheduler", {}) or {}
    lr_fn = multistep_lr(opt["train"].get("optim_g", {}).get("lr", 2e-5),
                         sched.get("milestones"), sched.get("gamma", 1.0))

    logger.info(f"Start training from iter {start_iter}, total {total_iter}.")
    current_iter = start_iter
    epoch = 0
    step_rng = jax.random.PRNGKey(opt.get("manual_seed", 0) + 1)
    start = time.time()
    while current_iter < total_iter:
        train_loader.sampler.set_epoch(epoch)
        for batch_np in train_loader:
            data_timer.record()
            if current_iter >= total_iter:
                break
            current_iter += 1
            batch_dev = shard_batch(
                {k_: v for k_, v in batch_np.items() if isinstance(v, np.ndarray)},
                mesh)
            prof = (opt.get("logger", {}) or {}).get("profile_iters")
            if prof and current_iter == int(prof):
                jax.profiler.start_trace(
                    osp.join(opt["path"]["experiments_root"], "profile"))
            step_rng, sub = jax.random.split(step_rng)
            state, logs = model.train_step(state, batch_dev, sub, current_iter)
            iter_timer.record()
            if prof and current_iter == int(prof) + 3:
                jax.block_until_ready(logs)
                jax.profiler.stop_trace()
                logger.info("Wrote profiler trace (3 steps).")

            if current_iter % print_freq == 0:
                log_vars = {"epoch": epoch, "iter": current_iter,
                            "lrs": [float(lr_fn(current_iter))],
                            "time": iter_timer.get_avg_time(),
                            "data_time": data_timer.get_avg_time()}
                log_vars.update({k_: float(v) for k_, v in logs.items()})
                msg_logger(log_vars)

            if current_iter % save_freq == 0 and jax.process_index() == 0:
                logger.info("Saving models and training states.")
                ckpt.save_training_checkpoint(
                    jax.device_get(state), opt["path"]["models"],
                    opt["path"]["training_states"], current_iter)

            if val_freq and current_iter % int(val_freq) == 0 and val_loader:
                run_validation(model, state, val_loader, opt, current_iter,
                               tb_logger, tracker)
            data_timer.start()
            iter_timer.start()
        epoch += 1

    logger.info(f"Training done, {time.time() - start:.1f}s. Saving final.")
    if jax.process_index() == 0:
        ckpt.save_training_checkpoint(jax.device_get(state),
                                      opt["path"]["models"],
                                      opt["path"]["training_states"],
                                      current_iter)
    if val_loader:
        run_validation(model, state, val_loader, opt, current_iter, tb_logger,
                       tracker)
    return state


def load_pretrained(model, state, path, which, param_key="params", strict=True):
    """Merge a converted/orbax weight tree into the matching state field
    (reference load_network, base_model.py:277-303)."""
    from flax import traverse_util
    import numpy as np

    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=False))
        tree = traverse_util.unflatten_dict(
            {tuple(k.split("/")): v for k, v in flat.items()})
    else:
        tree = ckpt.load_pytree(path)
        if param_key in tree:
            tree = tree[param_key]

    logger = get_root_logger()

    def merge_into(target, incoming, label):
        tflat = traverse_util.flatten_dict(target, sep="/")
        iflat = traverse_util.flatten_dict(incoming, sep="/")
        missing = set(tflat) - set(iflat)
        unexpected = set(iflat) - set(tflat)
        if missing:
            msg = f"{label}: {len(missing)} params not in checkpoint"
            if strict:
                raise KeyError(msg + f": {sorted(missing)[:5]} ...")
            logger.warning(msg)
        if unexpected:
            logger.warning(f"{label}: {len(unexpected)} unexpected ckpt keys")
        out = dict(tflat)
        for k_ in set(tflat) & set(iflat):
            if tflat[k_].shape != iflat[k_].shape:
                logger.warning(f"{label}: shape mismatch {k_}")
                if strict:
                    raise ValueError(f"shape mismatch {k_}")
                continue
            out[k_] = np.asarray(iflat[k_])
        return traverse_util.unflatten_dict(out, sep="/")

    if which == "g":
        # weights may cover the full net_g or just the trainable subset;
        # either way merge into the full tree then re-split
        from .models.ood_model import merge_params, split_params
        full = merge_params(state.params_g_train, state.params_g_frozen)
        full = merge_into(full, tree, "net_g")
        train, frozen = split_params(full, model.fix_list, model.grad_list)
        return state.replace(params_g_train=train, params_g_frozen=frozen,
                             ema_train=jax.tree_util.tree_map(np.copy, train))
    if which == "d":
        return state.replace(params_d=merge_into(state.params_d, tree, "net_d"))
    if which == "d2":
        return state.replace(params_d2=merge_into(state.params_d2, tree, "net_d2"))
    raise ValueError(which)
