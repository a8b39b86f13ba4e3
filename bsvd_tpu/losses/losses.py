"""Loss functions (jnp, traceable inside the jitted train step).

Reference set: BasicSR/basicsr/losses/losses.py:29-519 (L1/MSE/Charbonnier
with elementwise weighting + reduction, weighted TV, VGG perceptual/style).
GAN losses live in gan_loss.py.
"""

import jax
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
    """Negative PSNR (maximizing PSNR directly; BasicSR's NAFNet-era
    PSNRLoss semantics): scale * mean_over_batch(log(per-image MSE)) —
    the per-image log BEFORE the batch mean matters for both the value and
    the gradient (Jensen gap) — with optional Y-channel conversion of
    [0, 1] inputs (ITU-R BT.601 coefficients)."""

    def __init__(self, loss_weight=1.0, reduction='mean', to_y=False):
        assert reduction == 'mean', 'PSNRLoss only implements mean reduction'
        self.loss_weight = loss_weight
        self.to_y = to_y
        import math
        self.scale = 10.0 / math.log(10.0)

    @staticmethod
    def _rgb_to_y(x):
        coef = jnp.asarray([65.481, 128.553, 24.966], x.dtype)
        # Channel axis by rank: -1 for channels-last; else the canonical
        # position for the reference layouts — 1 for NCHW images, 2 for
        # (N, T, C, H, W) video (axis 1 is time there, so matching shape[1]
        # alone would mix over frames, not RGB).
        if x.shape[-1] == 3:                           # channels-last
            ch_axis = x.ndim - 1
        elif x.ndim == 4 and x.shape[1] == 3:          # NCHW
            ch_axis = 1
        elif x.ndim == 5 and x.shape[2] == 3:          # NTCHW video
            ch_axis = 2
        else:
            raise ValueError('to_y needs a 3-channel axis at its canonical '
                             f'position (-1, NCHW:1, NTCHW:2), got {x.shape}')
        shape = [1] * x.ndim
        shape[ch_axis] = 3
        y = (x * coef.reshape(shape)).sum(ch_axis, keepdims=True)
        return (y + 16.0) / 255.0

    def __call__(self, pred, target, weight=None):
        del weight
        if self.to_y:
            pred, target = self._rgb_to_y(pred), self._rgb_to_y(target)
        axes = tuple(range(1, pred.ndim))
        mse = jnp.mean(jnp.square(pred - target), axis=axes)
        return self.loss_weight * self.scale * jnp.mean(jnp.log(mse + 1e-8))


@LOSS_REGISTRY.register()
class PerceptualLoss:
    """VGG perceptual + style loss (reference losses.py:151-259).

    Returns ``(percep_loss_or_None, style_loss_or_None)`` like the
    reference. Pretrained VGG weights are external — pass
    ``pretrain_path`` (or set BSVD_VGG_PRETRAIN_PATH); with no weights
    available the extractor is random-init and a warning is logged.
    """

    def __init__(self, layer_weights, vgg_type='vgg19', use_input_norm=True,
                 range_norm=False, perceptual_weight=1.0, style_weight=0.,
                 criterion='l1', pretrain_path=None):
        from bsvd_tpu.archs.vgg_arch import VGGFeatureExtractor
        self.layer_weights = dict(layer_weights)
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.vgg = VGGFeatureExtractor(
            layer_name_list=list(layer_weights), vgg_type=vgg_type,
            use_input_norm=use_input_norm, range_norm=range_norm,
            pretrain_path=pretrain_path)
        if not self.vgg.pretrained:
            from bsvd_tpu.utils import get_root_logger
            get_root_logger().warning(
                'PerceptualLoss: no pretrained VGG weights found — using '
                'random init (set BSVD_VGG_PRETRAIN_PATH for parity).')
        self.criterion_type = criterion
        if criterion == 'l1':
            self.criterion = lambda a, b: jnp.mean(jnp.abs(a - b))
        elif criterion == 'l2':
            self.criterion = lambda a, b: jnp.mean(jnp.square(a - b))
        elif criterion == 'fro':
            self.criterion = lambda a, b: jnp.sqrt(jnp.sum(jnp.square(a - b)))
        else:
            raise NotImplementedError(
                f'{criterion} criterion has not been supported.')

    @staticmethod
    def _gram_mat(x):
        n, c, h, w = x.shape
        f = x.reshape(n, c, h * w)
        return (f @ jnp.swapaxes(f, 1, 2)) / (c * h * w)

    def __call__(self, x, gt):
        xf = self.vgg(x)
        gf = self.vgg(jax.lax.stop_gradient(jnp.asarray(gt)))
        percep = None
        if self.perceptual_weight > 0:
            percep = 0.
            for k in xf:
                percep += self.criterion(xf[k], gf[k]) * self.layer_weights[k]
            percep = percep * self.perceptual_weight
        style = None
        if self.style_weight > 0:
            style = 0.
            for k in xf:
                style += self.criterion(self._gram_mat(xf[k]),
                                        self._gram_mat(gf[k])) \
                    * self.layer_weights[k]
            style = style * self.style_weight
        return percep, style
