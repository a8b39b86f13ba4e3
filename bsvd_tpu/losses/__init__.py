"""Loss registry + factory (reference: BasicSR/basicsr/losses/__init__.py:14-26)."""

from copy import deepcopy

from bsvd_tpu.utils.registry import LOSS_REGISTRY
from bsvd_tpu.losses import losses  # noqa: F401  (registers losses)
from bsvd_tpu.losses import gan_loss  # noqa: F401  (registers GAN losses)
from bsvd_tpu.losses.losses import (CharbonnierLoss, L1Loss, MSELoss, PSNRLoss,  # noqa: F401
                                    WeightedTVLoss)
from bsvd_tpu.losses.gan_loss import (GANFeatLoss, GANLoss, MultiScaleGANLoss,  # noqa: F401
                                      g_path_regularize, gradient_penalty_loss,
                                      r1_penalty)

__all__ = ['build_loss', 'L1Loss', 'MSELoss', 'CharbonnierLoss', 'WeightedTVLoss',
           'PSNRLoss', 'GANLoss', 'MultiScaleGANLoss', 'GANFeatLoss']


def build_loss(opt):
    opt = deepcopy(dict(opt))
    loss_type = opt.pop('type')
    return LOSS_REGISTRY.get(loss_type)(**opt)
