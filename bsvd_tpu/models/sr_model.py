"""SRModel — single-image SR train/eval engine
(reference: BasicSR/basicsr/models/sr_model.py:14-212). Same jitted-SPMD
design as DenoisingModel, on (N, C, H, W) image batches."""

import os.path as osp
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bsvd_tpu.archs import build_network
from bsvd_tpu.losses import build_loss
from bsvd_tpu.metrics import calculate_metric
from bsvd_tpu.models.base_model import BaseModel
from bsvd_tpu.models.lr_scheduler import build_schedule
from bsvd_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from bsvd_tpu.utils import get_root_logger, imwrite, tensor2img
from bsvd_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class SRModel(BaseModel):

    def __init__(self, opt):
        super().__init__(opt)
        self.net = build_network(opt['network_g'])
        self.print_network(self.net)

        load_path = self.opt['path'].get('pretrain_network_g', None)
        if load_path is not None:
            param_key = self.opt['path'].get('param_key_g', 'params')
            self.net.load(load_path, param_key)

        self.params = self.net.params
        self.ema_params = None
        self.current_iter = 0
        self.mesh = make_mesh(opt.get('num_gpu', 'auto'))

        if self.is_train:
            self.init_training_settings()

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.ema_decay = train_opt.get('ema_decay', 0)
        if self.ema_decay > 0:
            get_root_logger().info(f'Use EMA with decay: {self.ema_decay}')
            self.ema_params = jax.tree.map(jnp.array, self.params)

        self.cri_pix = build_loss(train_opt['pixel_opt']) if train_opt.get('pixel_opt') else None
        self.cri_perceptual = (build_loss(train_opt['perceptual_opt'])
                               if train_opt.get('perceptual_opt') else None)
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError('Both pixel and perceptual losses are None.')

        self.lr_schedule = build_schedule(train_opt)
        optim_opt = dict(train_opt['optim_g'])
        optim_type = optim_opt.pop('type')
        if optim_type != 'Adam':
            raise NotImplementedError(f'optimizer {optim_type} is not supported yet.')
        betas = optim_opt.get('betas', (0.9, 0.999))
        self.tx = optax.adam(self.lr_schedule, b1=betas[0], b2=betas[1])
        self.opt_state = self.tx.init(self.params)

        apply_fn = self.net.apply
        cri_pix = self.cri_pix
        cri_perceptual = self.cri_perceptual
        tx = self.tx

        def step(params, opt_state, ema_params, batch, it, ema_decay):
            def loss_fn(p):
                out = apply_fn(p, batch['lq'])
                losses = {}
                total = 0.0
                if cri_pix is not None:
                    l_pix = cri_pix(out, batch['gt'])
                    total += l_pix
                    losses['l_pix'] = l_pix
                if cri_perceptual is not None:
                    l_percep, l_style = cri_perceptual(out, batch['gt'])
                    if l_percep is not None:
                        total += l_percep
                        losses['l_percep'] = l_percep
                    if l_style is not None:
                        total += l_style
                        losses['l_style'] = l_style
                return total, losses
            (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_params is not None:
                ema_params = BaseModel.ema_update(ema_params, params,
                                                  ema_decay)
            return params, opt_state, ema_params, loss_dict

        repl = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh, 4, batch_axis=0)
        self._batch_sharding = bsh
        self._train_step = jax.jit(
            step, in_shardings=(repl, repl, repl, {'lq': bsh, 'gt': bsh},
                                None, None),
            out_shardings=(repl, repl, repl, repl), donate_argnums=(0, 1, 2))

    def feed_data(self, data):
        self.lq = np.asarray(data['lq'])
        self.gt = np.asarray(data['gt']) if 'gt' in data else None
        if self.lq.ndim == 3:
            self.lq = self.lq[None]
        if self.gt is not None and self.gt.ndim == 3:
            self.gt = self.gt[None]

    def optimize_parameters(self, current_iter):
        self.current_iter = current_iter
        batch = jax.device_put({'lq': jnp.asarray(self.lq),
                                'gt': jnp.asarray(self.gt)},
                               self._batch_sharding)
        self.params, self.opt_state, self.ema_params, loss_dict = (
            self._train_step(self.params, self.opt_state, self.ema_params,
                             batch, current_iter, self.ema_decay))
        self.net.params = self.params
        self.log_dict = self.reduce_loss_dict(loss_dict)

    def test(self):
        params = self.ema_params if self.ema_params is not None else self.params
        self.output = np.asarray(self.net.apply(params, jnp.asarray(self.lq)))

    def validation(self, dataloader, current_iter, tb_logger, save_img=False):
        return self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        dataset_name = dataloader.dataset.opt['name']
        with_metrics = (self.opt.get('val') or {}).get('metrics') is not None
        if with_metrics:
            metric_results = {m: 0.0 for m in self.opt['val']['metrics']}
        cnt = 0
        for val_data in dataloader:
            img_name = osp.splitext(osp.basename(
                val_data['lq_path'][0] if isinstance(val_data['lq_path'], list)
                else val_data['lq_path']))[0]
            self.feed_data(val_data)
            self.test()
            sr_img = tensor2img(self.output[0])
            gt_img = tensor2img(self.gt[0]) if self.gt is not None else None

            if save_img:
                img_path = osp.join(self.opt['path']['visualization'],
                                    dataset_name,
                                    f"{img_name}_{self.opt['name']}.png")
                imwrite(sr_img, img_path)
            if with_metrics and gt_img is not None:
                data = {'img': sr_img, 'img2': gt_img}
                for name, opt_ in self.opt['val']['metrics'].items():
                    metric_results[name] += calculate_metric(data, opt_)
            cnt += 1
        if with_metrics and cnt:
            for m in metric_results:
                metric_results[m] /= cnt
            log_str = f'Validation {dataset_name}\n' + ''.join(
                f'\t # {m}: {v:.4f}\n' for m, v in metric_results.items())
            get_root_logger().info(log_str)
            if tb_logger:
                for m, v in metric_results.items():
                    tb_logger.add_scalar(f'metrics/{m}', v, current_iter)
            return metric_results
        return None

    def get_current_visuals(self):
        out = OrderedDict(lq=self.lq, result=self.output)
        if self.gt is not None:
            out['gt'] = self.gt
        return out

    def save(self, epoch, current_iter):
        if self.ema_params is not None:
            self.save_network([self.params, self.ema_params], 'g', current_iter,
                              param_key=['params', 'params_ema'])
        else:
            self.save_network(self.params, 'g', current_iter)
        self.save_training_state(epoch, current_iter, opt_state=self.opt_state,
                                 extra=self._training_state_extra())

@MODEL_REGISTRY.register()
class SwinIRModel(SRModel):
    """SwinIR engine (reference swinir_model.py only adds window-multiple
    padding at test time — handled inside the SwinIR arch wrapper here)."""
