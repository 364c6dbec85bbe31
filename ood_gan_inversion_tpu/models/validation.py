"""Validation loop (reference OOD_faceGAN_model.nondist_validation L795-926):
per-sample inversion, image + mask-strip dumps, metric dispatch, best-value
tracking."""

import os.path as osp
from collections import defaultdict

import numpy as np
import cv2
import jax

from ..utils.img_util import tensor2img, imwrite
from ..utils.logger import get_root_logger
from ..metrics import calculate_metric


class BestMetricTracker:
    """base_model.py:50-73."""

    def __init__(self, metrics_opt):
        self.records = {}
        for name, m in (metrics_opt or {}).items():
            better = m.get("better", "higher")
            init = -float("inf") if better == "higher" else float("inf")
            self.records[name] = {"better": better, "val": init, "iter": -1}

    def update(self, name, val, it):
        r = self.records[name]
        improved = (val >= r["val"]) if r["better"] == "higher" else (val <= r["val"])
        if improved:
            r["val"], r["iter"] = val, it
        return improved


def mask_strip(aligns, strip_h=256):
    """Horizontal strip of per-scale alpha masks (model L832-843 analogue)."""
    cols = []
    for k in sorted(aligns.keys()):
        alpha = np.asarray(aligns[k][0, ..., 2])
        alpha = cv2.resize(alpha, (strip_h, strip_h),
                           interpolation=cv2.INTER_NEAREST)
        cols.append((np.clip(alpha, 0, 1) * 255).astype(np.uint8))
    return np.concatenate(cols, axis=1) if cols else None


def run_validation(model, state, loader, opt, current_iter, tb_logger=None,
                   tracker: BestMetricTracker | None = None, ema=False):
    val_opt = opt.get("val", {}) or {}
    metrics_opt = val_opt.get("metrics", None)
    save_img = val_opt.get("save_img", False)
    save_lq_and_gt = val_opt.get("save_lq_and_gt", False)
    dataset_name = "val"
    logger = get_root_logger()
    rng = jax.random.PRNGKey(opt.get("manual_seed", 0))

    sums = defaultdict(float)
    count = 0
    for batch in loader:
        gt5 = batch["gt"]
        x = gt5.reshape((-1,) + gt5.shape[2:])
        out = model.infer(state, x, rng, step=current_iter, ema=ema)
        sr5 = np.asarray(out["image"]).reshape(gt5.shape)  # (B,K,H,W,C)
        sr_img = tensor2img(sr5[0, 0])   # view 0 for the visual dumps
        gt_img = tensor2img(gt5[0, 0])

        img_name = osp.splitext(osp.basename(
            batch["gt_path"][0][0] if isinstance(batch["gt_path"][0], list)
            else batch["gt_path"][0]))[0]
        if save_img:
            vis = opt["path"]["visualization"]
            imwrite(sr_img, osp.join(vis, img_name,
                                     f"{img_name}_{current_iter}.jpg"))
            strip = mask_strip({k: np.asarray(v)
                                for k, v in out["aligns"].items()})
            if strip is not None:
                imwrite(strip, osp.join(vis, img_name,
                                        f"{img_name}_{current_iter}_masks.jpg"))
            if save_lq_and_gt:
                imwrite(gt_img, osp.join(vis, img_name, f"{img_name}_gt.jpg"))

        if metrics_opt:
            # compare every MIMO view against ITS ground truth (a K>1 config
            # must not silently score only view 0), averaged per sample
            n_views = int(np.prod(gt5.shape[:2]))
            for name, m_opt in metrics_opt.items():
                v = 0.0
                for bi in range(gt5.shape[0]):
                    for ki in range(gt5.shape[1]):
                        v += calculate_metric(
                            {"img": tensor2img(sr5[bi, ki]),
                             "img2": tensor2img(gt5[bi, ki])}, m_opt)
                sums[name] += v / n_views
        count += 1

    results = {k: v / max(count, 1) for k, v in sums.items()}
    if metrics_opt:
        log = f"Validation {dataset_name}, iter {current_iter}: "
        for name, val in results.items():
            log += f"{name}: {val:.4f} "
            if tracker is not None:
                improved = tracker.update(name, val, current_iter)
                r = tracker.records[name]
                log += f"(best: {r['val']:.4f} @ {r['iter']}) "
            if tb_logger is not None:
                tb_logger.add_scalar(f"metrics/{dataset_name}/{name}", val,
                                     current_iter)
        logger.info(log)
    return results
