"""GAN losses + regularizers (reference: BasicSR/basicsr/losses/losses.py:
GANLoss :319-414, MultiScaleGANLoss :417-440, r1/gradient penalties :443-519).

Pure jnp — usable inside jitted train steps. The discriminator itself lives
with the GAN model family.
"""

import jax
import jax.numpy as jnp

from bsvd_tpu.utils.registry import LOSS_REGISTRY


def _bce_with_logits(logits, target):
    # stable binary cross-entropy with logits
    return jnp.mean(jnp.maximum(logits, 0) - logits * target +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))


@LOSS_REGISTRY.register()
class GANLoss:
    """vanilla | lsgan | wgan | wgan_softplus | hinge."""

    def __init__(self, gan_type, real_label_val=1.0, fake_label_val=0.0,
                 loss_weight=1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight
        if gan_type not in ('vanilla', 'lsgan', 'wgan', 'wgan_softplus', 'hinge'):
            raise NotImplementedError(f'GAN type {gan_type} is not implemented.')

    def _target(self, input, target_is_real):
        val = self.real_label_val if target_is_real else self.fake_label_val
        return jnp.full_like(input, val)

    def __call__(self, input, target_is_real, is_disc=False):
        t = self.gan_type
        if t == 'vanilla':
            loss = _bce_with_logits(input, self._target(input, target_is_real))
        elif t == 'lsgan':
            loss = jnp.mean((input - self._target(input, target_is_real))**2)
        elif t == 'wgan':
            loss = -jnp.mean(input) if target_is_real else jnp.mean(input)
        elif t == 'wgan_softplus':
            loss = (jnp.mean(jax.nn.softplus(-input)) if target_is_real
                    else jnp.mean(jax.nn.softplus(input)))
        elif t == 'hinge':
            if is_disc:
                input = -input if target_is_real else input
                loss = jnp.mean(jax.nn.relu(1 + input))
            else:
                loss = -jnp.mean(input)
        # generator loss is always weighted; disc loss is not (reference :408)
        return loss if is_disc else loss * self.loss_weight


@LOSS_REGISTRY.register()
class MultiScaleGANLoss(GANLoss):
    """GANLoss averaged over a list of multi-scale predictions."""

    def __call__(self, input, target_is_real, is_disc=False):
        if isinstance(input, (list, tuple)):
            total = 0.0
            for pred in input:
                if isinstance(pred, (list, tuple)):
                    pred = pred[-1]
                total = total + super().__call__(pred, target_is_real, is_disc)
            return total / len(input)
        return super().__call__(input, target_is_real, is_disc)


def r1_penalty(disc_fn, real_img):
    """R1 regularization: E[|grad D(x)|^2] on real images."""
    def scalar_disc(x):
        return jnp.sum(disc_fn(x))
    grad = jax.grad(scalar_disc)(real_img)
    return jnp.mean(jnp.sum(grad**2, axis=tuple(range(1, grad.ndim))))


def gradient_penalty_loss(disc_fn, real_data, fake_data, key, weight=None):
    """WGAN-GP penalty on random interpolates."""
    alpha_shape = (real_data.shape[0],) + (1,) * (real_data.ndim - 1)
    alpha = jax.random.uniform(key, alpha_shape, real_data.dtype)
    interp = alpha * real_data + (1 - alpha) * fake_data

    def scalar_disc(x):
        return jnp.sum(disc_fn(x))
    grad = jax.grad(scalar_disc)(interp)
    if weight is not None:
        grad = grad * weight
    norm = jnp.sqrt(jnp.sum(grad**2, axis=tuple(range(1, grad.ndim))) + 1e-12)
    loss = jnp.mean((norm - 1)**2)
    if weight is not None:
        loss = loss / jnp.mean(weight)
    return loss


def g_path_regularize(gen_fn, latents, mean_path_length, key, decay=0.01):
    """StyleGAN2 path-length regularization (reference losses.py:479-496).

    Args:
        gen_fn: latents -> image (the generator closure over its params).
    """
    probe_img = gen_fn(latents)
    noise = jax.random.normal(key, probe_img.shape, probe_img.dtype)
    noise = noise / (probe_img.shape[-2] * probe_img.shape[-1]) ** 0.5

    grad = jax.grad(lambda l: jnp.sum(gen_fn(l) * noise))(latents)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad**2, axis=-1), axis=-1) + 1e-12)
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean((path_lengths - path_mean)**2)
    return penalty, path_lengths, path_mean


@LOSS_REGISTRY.register()
class GANFeatLoss:
    """Feature-matching loss over multi-scale discriminator intermediates
    (reference losses.py:462-494): for each discriminator, L1/L2/Charbonnier
    between fake and (detached) real features of every layer but the last."""

    def __init__(self, criterion='l1', loss_weight=1.0, reduction='mean'):
        from bsvd_tpu.losses.losses import CharbonnierLoss, L1Loss, MSELoss
        if criterion == 'l1':
            self.loss_op = L1Loss(loss_weight, reduction)
        elif criterion == 'l2':
            self.loss_op = MSELoss(loss_weight, reduction)
        elif criterion == 'charbonnier':
            self.loss_op = CharbonnierLoss(loss_weight, reduction)
        else:
            raise ValueError(f'Unsupported loss mode: {criterion}. '
                             'Supported ones are: l1|l2|charbonnier')
        self.loss_weight = loss_weight

    def __call__(self, pred_fake, pred_real):
        num_d = len(pred_fake)
        loss = 0.0
        for i in range(num_d):
            # the last tensor is the final prediction — exclude it
            for j in range(len(pred_fake[i]) - 1):
                loss = loss + self.loss_op(
                    pred_fake[i][j],
                    jax.lax.stop_gradient(pred_real[i][j])) / num_d
        return loss * self.loss_weight
