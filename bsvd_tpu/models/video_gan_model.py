"""Video GAN engines (reference: BasicSR/basicsr/models/video_gan_model.py —
literally ``class VideoGANModel(SRGANModel, VideoBaseModel)`` — and
video_recurrent_gan_model.py, which flattens (b, t) into the batch for the
discriminator)."""

import jax.numpy as jnp

from bsvd_tpu.models.srgan_model import SRGANModel
from bsvd_tpu.models.video_base_model import VideoBaseModel
from bsvd_tpu.models.video_recurrent_model import VideoRecurrentModel
from bsvd_tpu.parallel.mesh import batch_sharding
from bsvd_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class VideoGANModel(SRGANModel):
    """Sliding-window video GAN (EDVR-style G): 5D lq window -> 4D center
    frame; adversarial loss on the restored frame."""

    feed_data = VideoBaseModel.feed_data
    test = VideoBaseModel.test
    nondist_validation = VideoBaseModel.nondist_validation

    def _batch_shardings(self):
        return {'lq': batch_sharding(self.mesh, 5, batch_axis=0),
                'gt': batch_sharding(self.mesh, 4, batch_axis=0)}


@MODEL_REGISTRY.register()
class VideoRecurrentGANModel(SRGANModel):
    """Recurrent video GAN (BasicVSR-style G): 5D lq -> 5D output; frames
    flatten into the discriminator batch (reference
    video_recurrent_gan_model.py optimize_parameters)."""

    feed_data = VideoRecurrentModel.feed_data
    test = VideoRecurrentModel.test
    nondist_validation = VideoRecurrentModel.nondist_validation

    def _d_apply(self):
        base = self.net_d.apply

        def d_apply(dp, x, train=False):
            x = jnp.asarray(x)
            if x.ndim == 5:
                n, t = x.shape[:2]
                x = x.reshape((n * t,) + x.shape[2:])
            return base(dp, x, train=train)
        return d_apply

    def _batch_shardings(self):
        bsh5 = batch_sharding(self.mesh, 5, batch_axis=0)
        return {'lq': bsh5, 'gt': bsh5}
