"""HiFaceGAN engine — generic face renovation training
(reference: BasicSR/basicsr/models/hifacegan_model.py:14-172).

The reference's conditional-D pattern is kept: fake and real images are
concatenated with the LQ input along channels, then batched together through
the multiscale discriminator in ONE pass (``discriminate`` /
``_divide_pred``, reference :74-114) so normalization sees consistent
statistics. Losses: pixel, multiscale GAN, and feature matching over the
intermediate D features (reference :129-139). EMA is unsupported, matching
the reference (:24-26).

TPU notes: one jitted step runs G then D (SRGAN ordering, which the
reference deliberately adopts at :143-146); the G update is gated on
``net_d_iters`` / ``net_d_init_iters`` via the step counter instead of a
Python branch so the compiled graph is static. The reference's spectral
norm on D convs (norm_d='spectralinstance') IS power-iterated during
training: every D forward normalizes w/sigma and the D-loss pass's updated
u vectors are folded back into the params after the optimizer step
(sn_aux_fold). Converted eval checkpoints fold sigma at conversion instead
(see tests/test_hifacegan.py).
"""

import jax
import jax.numpy as jnp
import optax

from bsvd_tpu.archs import build_network
from bsvd_tpu.losses import build_loss
from bsvd_tpu.models.lr_scheduler import build_schedule
from bsvd_tpu.models.sr_model import SRModel
from bsvd_tpu.parallel.mesh import batch_sharding, replicated_sharding
from bsvd_tpu.utils import get_root_logger
from bsvd_tpu.utils.registry import MODEL_REGISTRY


def _divide_pred(pred):
    """Split a batched (fake; real) multiscale prediction
    (reference hifacegan_model.py:98-114). Shapes are static under jit."""
    if isinstance(pred, (list, tuple)):
        fake = [[t[:t.shape[0] // 2] for t in p] for p in pred]
        real = [[t[t.shape[0] // 2:] for t in p] for p in pred]
        return fake, real
    return pred[:pred.shape[0] // 2], pred[pred.shape[0] // 2:]


@MODEL_REGISTRY.register()
class HiFaceGANModel(SRModel):
    """Face renovation: SPADE generator vs conditional multiscale D."""

    def init_training_settings(self):
        train_opt = self.opt['train']
        logger = get_root_logger()

        if train_opt.get('ema_decay', 0) > 0:
            raise NotImplementedError('HiFaceGAN does not support EMA now.')
        self.ema_decay = 0
        self.ema_params = None

        self.net_d = build_network(self.opt['network_d'])
        self.print_network(self.net_d)
        load_path = self.opt['path'].get('pretrain_network_d')
        if load_path:
            self.net_d.load(load_path,
                            self.opt['path'].get('param_key_d', 'params'))
        self.d_params = self.net_d.params

        self.cri_pix = (build_loss(train_opt['pixel_opt'])
                        if train_opt.get('pixel_opt') else None)
        self.cri_perceptual = (build_loss(train_opt['perceptual_opt'])
                               if train_opt.get('perceptual_opt') else None)
        self.cri_feat = (build_loss(train_opt['feature_matching_opt'])
                         if train_opt.get('feature_matching_opt') else None)
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError('Both pixel and perceptual losses are None.')
        self.cri_gan = build_loss(train_opt['gan_opt'])
        self.net_d_iters = train_opt.get('net_d_iters', 1)
        self.net_d_init_iters = train_opt.get('net_d_init_iters', 0)
        logger.info('HiFaceGAN: conditional multiscale D, '
                    f'feat-matching={"on" if self.cri_feat else "off"}')

        self.lr_schedule = build_schedule(train_opt)
        og = dict(train_opt['optim_g'])
        od = dict(train_opt.get('optim_d', train_opt['optim_g']))
        bg = og.get('betas', (0.9, 0.999))
        bd = od.get('betas', (0.9, 0.999))
        base_lr = float(og['lr'])
        d_lr = float(od.get('lr', base_lr))
        self.tx_g = optax.adam(self.lr_schedule, b1=bg[0], b2=bg[1])
        self.tx_d = optax.adam(lambda s: self.lr_schedule(s) * (d_lr / base_lr),
                               b1=bd[0], b2=bd[1])
        self.opt_state = self.tx_g.init(self.params)
        self.opt_state_d = self.tx_d.init(self.d_params)

        g_apply = self.net.apply
        d_apply = self.net_d.apply
        cri_pix, cri_gan, cri_feat = self.cri_pix, self.cri_gan, self.cri_feat
        cri_perceptual = self.cri_perceptual
        tx_g, tx_d = self.tx_g, self.tx_d
        nd_iters, nd_init = self.net_d_iters, self.net_d_init_iters

        def discriminate(dp, lq, output, gt):
            """Conditional D on one (fake; real) batch
            (reference hifacegan_model.py:74-96). G is scale-1 here, so the
            shapes always match and no resize branch is needed."""
            fake_concat = jnp.concatenate([lq, output], axis=1)
            real_concat = jnp.concatenate([lq, gt], axis=1)
            both = jnp.concatenate([fake_concat, real_concat], axis=0)
            pred, aux = d_apply(dp, both, train=True)
            return _divide_pred(pred) + (aux,)

        def g_loss(gp, dp, lq, gt):
            fake = g_apply(gp, lq)
            losses = {}
            total = 0.0
            if cri_pix is not None:
                l_g_pix = cri_pix(fake, gt)
                total += l_g_pix
                losses['l_g_pix'] = l_g_pix
            if cri_perceptual is not None:
                l_percep, l_style = cri_perceptual(fake, gt)
                if l_percep is not None:
                    total += l_percep
                    losses['l_g_percep'] = l_percep
                if l_style is not None:
                    total += l_style
                    losses['l_g_style'] = l_style
            pred_fake, pred_real, _ = discriminate(dp, lq, fake, gt)
            l_g_gan = cri_gan(pred_fake, True, is_disc=False)
            total += l_g_gan
            losses['l_g_gan'] = l_g_gan
            if cri_feat is not None:
                l_g_feat = cri_feat(pred_fake, pred_real)
                total += l_g_feat
                losses['l_g_feat'] = l_g_feat
            return total, (losses, fake)

        def d_loss(dp, lq, fake, gt):
            pred_fake, pred_real, aux = discriminate(dp, lq, fake, gt)
            l_d_real = cri_gan(pred_real, True, is_disc=True)
            l_d_fake = cri_gan(pred_fake, False, is_disc=True)
            losses = {'l_d_real': l_d_real, 'l_d_fake': l_d_fake}
            return (l_d_real + l_d_fake) / 2, (losses, aux)

        def step(gp, g_opt, dp, d_opt, batch, it):
            lq, gt = batch['lq'], batch['gt']
            # ---- G ----
            (_, (g_losses, fake)), g_grads = jax.value_and_grad(
                g_loss, has_aux=True)(gp, dp, lq, gt)
            # Gated G step: select params AND optimizer state so gated-off
            # iterations leave Adam's moments/bias counter untouched
            # (zeroed grads would still advance them; reference skips the
            # whole block, hifacegan_model.py:117-146).
            g_on = jnp.logical_and(it % nd_iters == 0, it > nd_init)
            g_updates, g_opt_new = tx_g.update(g_grads, g_opt, gp)
            gp_new = optax.apply_updates(gp, g_updates)
            gp = jax.tree.map(lambda a, b: jnp.where(g_on, a, b), gp_new, gp)
            g_opt = jax.tree.map(lambda a, b: jnp.where(g_on, a, b),
                                 g_opt_new, g_opt)
            # ---- D (SRGAN ordering: same fake, reference :143-146) ----
            fake = jax.lax.stop_gradient(fake)
            (_, (d_losses, sn_aux)), d_grads = jax.value_and_grad(
                d_loss, has_aux=True)(dp, lq, fake, gt)
            d_updates, d_opt = tx_d.update(d_grads, d_opt, dp)
            dp = optax.apply_updates(dp, d_updates)
            # persist the spectral-norm power-iteration vectors
            from bsvd_tpu.archs.hifacegan_arch import sn_aux_fold
            dp = sn_aux_fold(dp, sn_aux)
            return gp, g_opt, dp, d_opt, {**g_losses, **d_losses}

        repl = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh, 4, batch_axis=0)
        self._batch_sharding = {'lq': bsh, 'gt': bsh}
        self._train_step = jax.jit(
            step,
            in_shardings=(repl, repl, repl, repl, self._batch_sharding, None),
            out_shardings=(repl, repl, repl, repl, repl),
            donate_argnums=(0, 1, 2, 3))

    def optimize_parameters(self, current_iter):
        self.current_iter = current_iter
        batch = jax.device_put({'lq': jnp.asarray(self.lq),
                                'gt': jnp.asarray(self.gt)},
                               self._batch_sharding)
        (self.params, self.opt_state, self.d_params, self.opt_state_d,
         loss_dict) = self._train_step(
            self.params, self.opt_state, self.d_params, self.opt_state_d,
            batch, jnp.asarray(current_iter))
        self.net.params = self.params
        self.net_d.params = self.d_params
        self.log_dict = self.reduce_loss_dict(loss_dict)

    def save(self, epoch, current_iter):
        super().save(epoch, current_iter)
        self.save_network(self.d_params, 'd', current_iter)

    def _training_state_extra(self):
        return {'opt_state_d': self.opt_state_d}

    def resume_training(self, resume_state):
        super().resume_training(resume_state)
        d_state = (resume_state.get('extra') or {}).get('opt_state_d')
        if d_state is not None:
            self.opt_state_d = self.restore_opt_state(self.opt_state_d,
                                                      d_state)
