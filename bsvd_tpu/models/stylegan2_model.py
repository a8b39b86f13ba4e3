"""StyleGAN2 training engine (reference:
BasicSR/basicsr/models/stylegan2_model.py — nonsaturating logistic GAN with
lazy regularization: r1 on the discriminator every ``net_d_reg_every`` iters,
path-length on the generator every ``net_g_reg_every`` iters, reg-ratio-scaled
Adam, style mixing, EMA generator).

Four jitted step variants (d / d+r1 / g / g+path) selected per iteration by
the lazy-reg schedule; mean_path_length is explicit carried state."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bsvd_tpu.archs import build_network
from bsvd_tpu.losses import build_loss
from bsvd_tpu.losses.gan_loss import g_path_regularize, r1_penalty
from bsvd_tpu.models.base_model import BaseModel
from bsvd_tpu.parallel.mesh import batch_sharding, make_mesh
from bsvd_tpu.utils import get_root_logger
from bsvd_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class StyleGAN2Model(BaseModel):

    def __init__(self, opt):
        super().__init__(opt)
        self.net = build_network(opt['network_g'])
        self.print_network(self.net)
        load_path = self.opt['path'].get('pretrain_network_g')
        if load_path:
            self.net.load(load_path, self.opt['path'].get('param_key_g', 'params'))
        self.params = self.net.params
        # eval mode never runs init_training_settings: sample from the
        # loaded weights (test configs load params_ema via param_key_g,
        # matching the reference's net_g_ema-only test path)
        self.ema_params = self.params
        self.num_style_feat = opt['network_g'].get('num_style_feat', 512)
        self.mesh = make_mesh(opt.get('num_gpu', 'auto'))
        self.current_iter = 0
        if self.is_train:
            self.init_training_settings()

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.net_d = build_network(self.opt['network_d'])
        self.print_network(self.net_d)
        load_path = self.opt['path'].get('pretrain_network_d')
        if load_path:
            self.net_d.load(load_path, self.opt['path'].get('param_key_d', 'params'))
        self.d_params = self.net_d.params
        self.ema_params = jax.tree.map(jnp.array, self.params)

        self.cri_gan = build_loss(train_opt['gan_opt'])
        self.r1_reg_weight = train_opt['r1_reg_weight']
        self.path_reg_weight = train_opt['path_reg_weight']
        self.net_g_reg_every = train_opt['net_g_reg_every']
        self.net_d_reg_every = train_opt['net_d_reg_every']
        self.mixing_prob = train_opt['mixing_prob']
        self.mean_path_length = jnp.zeros(())
        self.ema_decay = train_opt.get('ema_decay', 0.5**(32 / (10 * 1000)))

        g_ratio = self.net_g_reg_every / (self.net_g_reg_every + 1)
        d_ratio = self.net_d_reg_every / (self.net_d_reg_every + 1)
        g_lr = train_opt['optim_g']['lr'] * g_ratio
        d_lr = train_opt['optim_d']['lr'] * d_ratio
        self.tx_g = optax.adam(g_lr, b1=0**g_ratio, b2=0.99**g_ratio)
        self.tx_d = optax.adam(d_lr, b1=0**d_ratio, b2=0.99**d_ratio)
        self.opt_state = self.tx_g.init(self.params)
        self.opt_state_d = self.tx_d.init(self.d_params)

        gen = self.net
        disc = self.net_d
        cri_gan = self.cri_gan
        tx_g, tx_d = self.tx_g, self.tx_d
        r1_w, path_w = self.r1_reg_weight, self.path_reg_weight
        d_every, g_every = self.net_d_reg_every, self.net_g_reg_every

        def gen_imgs(gp, styles, key):
            img, latent = gen.apply(gp, styles, noise_key=key,
                                    randomize_noise=True)
            return img, latent

        def d_step(gp, dp, d_opt, real, key, do_r1):
            k1, k2 = jax.random.split(key)
            styles = self._sample_styles(k1, real.shape[0])

            def loss_fn(dpp):
                fake, _ = gen_imgs(gp, styles, k2)
                fake = jax.lax.stop_gradient(fake)
                fake_pred, _ = disc.apply(dpp, fake)
                real_pred, _ = disc.apply(dpp, real)
                l_d = (cri_gan(real_pred, True, is_disc=True) +
                       cri_gan(fake_pred, False, is_disc=True))
                if do_r1:
                    l_r1 = r1_penalty(lambda x: disc.apply(dpp, x)[0], real)
                    # lazy reg scaling (reference: r1/2 * w * d_every + 0*pred)
                    l_d = l_d + (r1_w / 2 * l_r1 * d_every)
                else:
                    l_r1 = jnp.zeros(())
                return l_d, {'l_d': l_d, 'l_d_r1': l_r1,
                             'real_score': jnp.mean(real_pred),
                             'fake_score': jnp.mean(fake_pred)}

            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(dp)
            updates, d_opt = tx_d.update(grads, d_opt, dp)
            return optax.apply_updates(dp, updates), d_opt, logs

        def g_step(gp, dp, g_opt, ema, mean_path, key, do_path, ema_decay):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            styles = self._sample_styles(k1, self._batch)

            def loss_fn(gpp):
                fake, _ = gen_imgs(gpp, styles, k2)
                fake_pred, _ = disc.apply(dp, fake)
                l_g = cri_gan(fake_pred, True, is_disc=False)
                aux = {'l_g': l_g}
                new_mean = mean_path
                if do_path:
                    from bsvd_tpu.archs.stylegan2_arch import style_mlp_apply
                    path_batch = max(1, self._batch // 2)
                    z = jax.random.normal(k3, (path_batch, self.num_style_feat))
                    latents = style_mlp_apply(gpp['style_mlp'], z, gen.lr_mlp)

                    def gen_from_latent(lat):
                        img, _ = gen.apply(gpp, [lat], input_is_latent=True,
                                           noise_key=k4, randomize_noise=True)
                        return img
                    l_path, _, new_mean = g_path_regularize(
                        gen_from_latent, latents, mean_path, k4)
                    l_g = l_g + path_w * g_every * l_path
                    aux['l_g_path'] = l_path
                else:
                    aux['l_g_path'] = jnp.zeros(())
                return l_g, (aux, new_mean)

            (_, (logs, new_mean)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(gp)
            updates, g_opt = tx_g.update(grads, g_opt, gp)
            gp = optax.apply_updates(gp, updates)
            ema = BaseModel.ema_update(ema, gp, ema_decay)
            return gp, g_opt, ema, new_mean, logs

        self._d_step = {flag: jax.jit(lambda gp, dp, do, real, key, f=flag:
                                      d_step(gp, dp, do, real, key, f),
                                      donate_argnums=(1, 2))
                        for flag in (False, True)}
        self._g_step = {flag: jax.jit(
            lambda gp, dp, go, ema, mp, key, ed, f=flag:
            g_step(gp, dp, go, ema, mp, key, f, ed),
            donate_argnums=(0, 2, 3)) for flag in (False, True)}
        self._key = jax.random.PRNGKey(self.opt.get('manual_seed', 0))
        self._bsh = batch_sharding(self.mesh, 4, batch_axis=0)

    def _sample_styles(self, key, batch):
        kp, k1, k2 = jax.random.split(key, 3)
        mix = jax.random.uniform(kp) < self.mixing_prob
        n1 = jax.random.normal(k1, (batch, self.num_style_feat))
        n2 = jax.random.normal(k2, (batch, self.num_style_feat))
        # static structure: always two styles; mixing selects via inject blend
        return [n1, jnp.where(mix, n2, n1)]

    def feed_data(self, data):
        self.real_img = np.asarray(data['gt'])
        self._batch = self.real_img.shape[0]

    def optimize_parameters(self, current_iter):
        self.current_iter = current_iter
        self._key, kd, kg = jax.random.split(self._key, 3)
        real = jax.device_put(jnp.asarray(self.real_img), self._bsh)

        do_r1 = (current_iter % self.net_d_reg_every == 0)
        self.d_params, self.opt_state_d, d_logs = self._d_step[do_r1](
            self.params, self.d_params, self.opt_state_d, real, kd)

        do_path = (current_iter % self.net_g_reg_every == 0)
        (self.params, self.opt_state, self.ema_params, self.mean_path_length,
         g_logs) = self._g_step[do_path](
            self.params, self.d_params, self.opt_state, self.ema_params,
            self.mean_path_length, kg, self.ema_decay)
        self.net.params = self.params
        self.net_d.params = self.d_params
        self.log_dict = self.reduce_loss_dict(
            OrderedDict(**d_logs, **g_logs))

    def test(self, num_samples=16, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        z = jax.random.normal(key, (num_samples, self.num_style_feat))
        img, _ = self.net.apply(self.ema_params, [z], noise_key=key,
                                randomize_noise=True)
        self.output = np.asarray(img)
        return self.output

    def validation(self, dataloader, current_iter, tb_logger, save_img=False):
        del dataloader, tb_logger, save_img
        self.test()
        return {}

    def save(self, epoch, current_iter):
        self.save_network([self.params, self.ema_params], 'g', current_iter,
                          param_key=['params', 'params_ema'])
        self.save_network(self.d_params, 'd', current_iter)
        self.save_training_state(
            epoch, current_iter,
            opt_state=(self.opt_state, self.opt_state_d),
            # the reference drops the path-reg EMA on restart
            # (stylegan2_model.py keeps it only in memory); persisting it
            # keeps the g_path penalty continuous across resumes
            extra={'mean_path_length': np.asarray(self.mean_path_length)})

    def resume_training(self, resume_state):
        opt_state = resume_state.get('opt_state')
        if opt_state is not None:
            g_state, d_state = opt_state
            self.opt_state = self.restore_opt_state(self.opt_state, g_state)
            self.opt_state_d = self.restore_opt_state(self.opt_state_d,
                                                      d_state)
        mpl = (resume_state.get('extra') or {}).get('mean_path_length')
        if mpl is not None:
            self.mean_path_length = jnp.asarray(mpl, jnp.float32)
