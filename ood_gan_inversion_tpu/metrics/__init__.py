"""Metric layer (reference BasicSR/basicsr/metrics + src/metrics)."""

from copy import deepcopy

from ..utils.registry import METRIC_REGISTRY
from .psnr_ssim import calculate_psnr, calculate_ssim
from .lpips import calculate_lpips, LPIPSModel
from .identity import calculate_identity
from .fid import calculate_fid, frechet_distance, feature_stats
from .niqe import calculate_niqe, niqe_score, default_gaussian_window


def calculate_metric(data, opt):
    """Registry dispatch (BasicSR/basicsr/metrics/__init__.py:10-20)."""
    opt = deepcopy(opt)
    metric_type = opt.pop("type")
    opt.pop("better", None)
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
