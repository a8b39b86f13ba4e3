"""Loss functions (jnp, traceable inside the jitted train step).

Reference set: BasicSR/basicsr/losses/losses.py:29-519 (L1/MSE/Charbonnier
with elementwise weighting + reduction, weighted TV). Perceptual/GAN losses
are torch-VGG-dependent in the reference and are not needed by any BSVD
config; they raise NotImplementedError here until a JAX VGG lands.
"""

import jax.numpy as jnp

from bsvd_tpu.utils.registry import LOSS_REGISTRY

_REDUCTIONS = ('none', 'mean', 'sum')


def _reduce(x, weight, reduction):
    if weight is not None:
        x = x * weight
    if reduction == 'none':
        return x
    if reduction == 'mean':
        return jnp.mean(x)
    if reduction == 'sum':
        return jnp.sum(x)
    raise ValueError(f'reduction {reduction!r} not in {_REDUCTIONS}')


@LOSS_REGISTRY.register()
class L1Loss:
    def __init__(self, loss_weight=1.0, reduction='mean'):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * _reduce(jnp.abs(pred - target), weight,
                                          self.reduction)


@LOSS_REGISTRY.register()
class MSELoss:
    def __init__(self, loss_weight=1.0, reduction='mean'):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * _reduce(jnp.square(pred - target), weight,
                                          self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss:
    """sqrt((x - y)^2 + eps^2) — differentiable L1 variant."""

    def __init__(self, loss_weight=1.0, reduction='mean', eps=1e-12):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * _reduce(
            jnp.sqrt(jnp.square(pred - target) + self.eps), weight, self.reduction)


@LOSS_REGISTRY.register()
class WeightedTVLoss(L1Loss):
    """Total-variation loss on (..., H, W, C) or (..., C, H, W) images.

    Follows the reference (y-diff + x-diff L1 to shifted self); assumes the
    last two/three dims are spatial-channel as given by ``data_format``.
    """

    def __init__(self, loss_weight=1.0, reduction='mean', data_format='NCHW'):
        if reduction not in ('mean', 'sum'):
            raise ValueError(f'reduction {reduction!r} not supported for TV loss')
        super().__init__(loss_weight=loss_weight, reduction=reduction)
        self.data_format = data_format

    def __call__(self, pred, weight=None):
        if self.data_format == 'NCHW':
            y0, y1 = pred[..., :-1, :], pred[..., 1:, :]
            x0, x1 = pred[..., :, :-1], pred[..., :, 1:]
        else:  # NHWC
            y0, y1 = pred[..., :-1, :, :], pred[..., 1:, :, :]
            x0, x1 = pred[..., :, :-1, :], pred[..., :, 1:, :]
        y_w = x_w = None
        if weight is not None:
            if self.data_format == 'NCHW':
                y_w, x_w = weight[..., :-1, :], weight[..., :, :-1]
            else:
                y_w, x_w = weight[..., :-1, :, :], weight[..., :, :-1, :]
        y_diff = super().__call__(y0, y1, weight=y_w)
        x_diff = super().__call__(x0, x1, weight=x_w)
        return x_diff + y_diff


@LOSS_REGISTRY.register()
class PSNRLoss:
    """Negative PSNR (maximizing PSNR directly)."""

    def __init__(self, loss_weight=1.0, reduction='mean', to_y=False):
        del reduction
        self.loss_weight = loss_weight
        self.to_y = to_y

    def __call__(self, pred, target, weight=None):
        del weight
        mse = jnp.mean(jnp.square(pred - target))
        return self.loss_weight * 10.0 * jnp.log10(mse + 1e-12)


@LOSS_REGISTRY.register()
class PerceptualLoss:
    def __init__(self, *a, **k):
        raise NotImplementedError(
            'PerceptualLoss needs pretrained VGG weights which are not '
            'bundled; no BSVD config uses it.')
