"""SRGAN / ESRGAN engines — adversarial SR training
(reference: BasicSR/basicsr/models/srgan_model.py:12-142 and
esrgan_model.py:8-83 with its relativistic GAN formulation).

One jitted step updates G then D (reference order): the generator trains
against the frozen discriminator, then the discriminator trains on
(real, stop_gradient(fake)). Generator updates are gated on
``net_d_iters`` / ``net_d_init_iters`` via the step counter. Discriminator
statefuls (BN batch stats / spectral-norm power vectors) are applied after
the D update inside the same jit."""

import jax
import jax.numpy as jnp
import optax

from bsvd_tpu.archs import build_network
from bsvd_tpu.losses import build_loss
from bsvd_tpu.models.base_model import BaseModel
from bsvd_tpu.models.lr_scheduler import build_schedule
from bsvd_tpu.models.sr_model import SRModel
from bsvd_tpu.parallel.mesh import batch_sharding, replicated_sharding
from bsvd_tpu.utils import get_root_logger
from bsvd_tpu.utils.registry import MODEL_REGISTRY


def _d_aux_update(d_params, aux):
    """Fold discriminator side-state back into params: BN (mean, var) tuples
    get a running-stat update; spectral-norm u vectors are stored."""
    from bsvd_tpu.archs.discriminator_arch import bn_update_running
    new = dict(d_params)
    for name, val in aux.items():
        if isinstance(val, tuple):
            new[name] = bn_update_running(d_params[name], val)
        else:
            new[name] = dict(d_params[name], u=val)
    return new


@MODEL_REGISTRY.register()
class SRGANModel(SRModel):
    """Pixel + GAN loss SR training (perceptual loss raises until a JAX VGG
    lands — reference configs can disable it)."""

    relativistic = False

    def init_training_settings(self):
        train_opt = self.opt['train']
        logger = get_root_logger()

        self.ema_decay = train_opt.get('ema_decay', 0)
        if self.ema_decay > 0:
            logger.info(f'Use EMA with decay: {self.ema_decay}')
            self.ema_params = jax.tree.map(jnp.array, self.params)

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
        self.cri_gan = build_loss(train_opt['gan_opt'])
        self.net_d_iters = train_opt.get('net_d_iters', 1)
        self.net_d_init_iters = train_opt.get('net_d_init_iters', 0)

        self.lr_schedule = build_schedule(train_opt)
        og = dict(train_opt['optim_g'])
        od = dict(train_opt.get('optim_d', train_opt['optim_g']))
        bg = og.get('betas', (0.9, 0.999))
        bd = od.get('betas', (0.9, 0.999))
        d_lr = float(od.get('lr', og['lr']))
        base_lr = float(og['lr'])
        self.tx_g = optax.adam(self.lr_schedule, b1=bg[0], b2=bg[1])
        self.tx_d = optax.adam(lambda s: self.lr_schedule(s) * (d_lr / base_lr),
                               b1=bd[0], b2=bd[1])
        self.opt_state = self.tx_g.init(self.params)
        self.opt_state_d = self.tx_d.init(self.d_params)

        g_apply = self.net.apply
        d_apply = self._d_apply()
        cri_pix, cri_gan = self.cri_pix, self.cri_gan
        cri_perceptual = self.cri_perceptual
        tx_g, tx_d = self.tx_g, self.tx_d
        relativistic = self.relativistic
        nd_iters, nd_init = self.net_d_iters, self.net_d_init_iters

        def g_loss(gp, dp, lq, gt):
            fake = g_apply(gp, lq)
            losses = {}
            total = 0.0
            if cri_pix is not None:
                l_pix = cri_pix(fake, gt)
                total += l_pix
                losses['l_g_pix'] = l_pix
            if cri_perceptual is not None:
                l_percep, l_style = cri_perceptual(fake, gt)
                if l_percep is not None:
                    total += l_percep
                    losses['l_g_percep'] = l_percep
                if l_style is not None:
                    total += l_style
                    losses['l_g_style'] = l_style
            fake_pred, _ = d_apply(dp, fake, train=True)
            if relativistic:
                real_pred, _ = d_apply(dp, gt, train=True)
                real_pred = jax.lax.stop_gradient(real_pred)
                l_g_real = cri_gan(real_pred - jnp.mean(fake_pred), False,
                                   is_disc=False)
                l_g_fake = cri_gan(fake_pred - jnp.mean(real_pred), True,
                                   is_disc=False)
                l_g_gan = (l_g_real + l_g_fake) / 2
            else:
                l_g_gan = cri_gan(fake_pred, True, is_disc=False)
            total += l_g_gan
            losses['l_g_gan'] = l_g_gan
            return total, (losses, fake)

        def d_loss(dp, fake, gt):
            real_pred, aux_r = d_apply(dp, gt, train=True)
            fake_pred, _ = d_apply(dp, fake, train=True)
            if relativistic:
                l_d_real = cri_gan(
                    real_pred - jnp.mean(jax.lax.stop_gradient(fake_pred)),
                    True, is_disc=True) * 0.5
                l_d_fake = cri_gan(
                    fake_pred - jnp.mean(jax.lax.stop_gradient(real_pred)),
                    False, is_disc=True) * 0.5
            else:
                l_d_real = cri_gan(real_pred, True, is_disc=True)
                l_d_fake = cri_gan(fake_pred, False, is_disc=True)
            losses = {'l_d_real': l_d_real, 'l_d_fake': l_d_fake,
                      'out_d_real': jnp.mean(real_pred),
                      'out_d_fake': jnp.mean(fake_pred)}
            return l_d_real + l_d_fake, (losses, aux_r)

        def step(gp, g_opt, dp, d_opt, ema, batch, it, ema_decay):
            lq, gt = batch['lq'], batch['gt']
            # ---- G ----
            (_, (g_losses, fake)), g_grads = jax.value_and_grad(
                g_loss, has_aux=True)(gp, dp, lq, gt)
            # Gated G step: on gated-off iterations BOTH params and the
            # optimizer state must stay unchanged (the reference skips the
            # whole G block, srgan_model.py:83-120), so select between the
            # candidate and the previous state rather than zeroing grads —
            # zeroed grads would still advance Adam's moments/bias counter.
            g_on = jnp.logical_and(it % nd_iters == 0, it > nd_init)
            g_updates, g_opt_new = tx_g.update(g_grads, g_opt, gp)
            gp_new = optax.apply_updates(gp, g_updates)
            gp = jax.tree.map(lambda a, b: jnp.where(g_on, a, b), gp_new, gp)
            g_opt = jax.tree.map(lambda a, b: jnp.where(g_on, a, b),
                                 g_opt_new, g_opt)
            if ema is not None:
                ema = BaseModel.ema_update(ema, gp, ema_decay)
            # ---- D ----
            fake = jax.lax.stop_gradient(fake)
            (_, (d_losses, aux)), d_grads = jax.value_and_grad(
                d_loss, has_aux=True)(dp, fake, gt)
            d_updates, d_opt = tx_d.update(d_grads, d_opt, dp)
            dp = optax.apply_updates(dp, d_updates)
            dp = _d_aux_update(dp, aux)
            return gp, g_opt, dp, d_opt, ema, {**g_losses, **d_losses}

        repl = replicated_sharding(self.mesh)
        self._batch_sharding = self._batch_shardings()
        self._train_step = jax.jit(
            step,
            in_shardings=(repl, repl, repl, repl, repl, self._batch_sharding,
                          None, None),
            out_shardings=(repl, repl, repl, repl, repl, repl),
            donate_argnums=(0, 1, 2, 3, 4))

    # ---- subclass hooks ---------------------------------------------- #
    def _d_apply(self):
        """Discriminator apply fn used inside the step (subclasses may wrap,
        e.g. to flatten video sequences into frame batches)."""
        return self.net_d.apply

    def _batch_shardings(self):
        bsh = batch_sharding(self.mesh, 4, batch_axis=0)
        return {'lq': bsh, 'gt': bsh}

    def optimize_parameters(self, current_iter):
        self.current_iter = current_iter
        batch = jax.device_put({'lq': jnp.asarray(self.lq),
                                'gt': jnp.asarray(self.gt)},
                               self._batch_sharding)
        (self.params, self.opt_state, self.d_params, self.opt_state_d,
         self.ema_params, loss_dict) = self._train_step(
            self.params, self.opt_state, self.d_params, self.opt_state_d,
            self.ema_params, batch, jnp.asarray(current_iter), self.ema_decay)
        self.net.params = self.params
        self.net_d.params = self.d_params
        self.log_dict = self.reduce_loss_dict(loss_dict)

    def save(self, epoch, current_iter):
        super().save(epoch, current_iter)
        self.save_network(self.d_params, 'd', current_iter)

    def _training_state_extra(self):
        # the D optimizer state rides the .state file's extra slot
        # (reference saves every optimizer in self.optimizers,
        # base_model.py:280-313)
        return {'opt_state_d': self.opt_state_d}

    def resume_training(self, resume_state):
        super().resume_training(resume_state)
        d_state = (resume_state.get('extra') or {}).get('opt_state_d')
        if d_state is not None:
            self.opt_state_d = self.restore_opt_state(self.opt_state_d,
                                                      d_state)


@MODEL_REGISTRY.register()
class ESRGANModel(SRGANModel):
    """Relativistic average GAN variant (reference esrgan_model.py)."""
    relativistic = True
