"""Metric registry + dispatcher (reference: BasicSR/basicsr/metrics/__init__.py:10-20)."""

from copy import deepcopy

from bsvd_tpu.utils.registry import METRIC_REGISTRY
from bsvd_tpu.metrics import psnr_ssim  # noqa: F401  (registers metrics)
from bsvd_tpu.metrics import niqe  # noqa: F401  (registers calculate_niqe)
from bsvd_tpu.metrics.psnr_ssim import calculate_psnr, calculate_psnr_float, calculate_ssim  # noqa: F401
from bsvd_tpu.metrics.niqe import calculate_niqe  # noqa: F401

__all__ = ['calculate_metric', 'calculate_psnr', 'calculate_ssim',
           'calculate_psnr_float', 'calculate_niqe']


def calculate_metric(data, opt):
    """Dispatch by opt['type']; remaining opt keys are kwargs."""
    opt = deepcopy(dict(opt))
    metric_type = opt.pop('type')
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
