"""VideoRecurrentModel — train/eval engine for recurrent video SR (BasicVSR)
(reference: BasicSR/basicsr/models/video_recurrent_model.py + the per-folder
eval of video_base_model.py).

Supports the reference's flow-network schedule: spynet frozen for the first
``fix_flow`` iterations, then trained with lr scaled by ``flow_lr_mul`` —
implemented with optax.multi_transform over param labels instead of optimizer
param-group surgery."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bsvd_tpu.metrics import calculate_metric
from bsvd_tpu.models.base_model import BaseModel
from bsvd_tpu.models.lr_scheduler import build_schedule
from bsvd_tpu.models.sr_model import SRModel
from bsvd_tpu.parallel.mesh import batch_sharding, replicated_sharding
from bsvd_tpu.utils import get_root_logger, imwrite, tensor2img
from bsvd_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class VideoRecurrentModel(SRModel):

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.fix_flow_iter = train_opt.get('fix_flow', 0)
        flow_lr_mul = train_opt.get('flow_lr_mul', 1)
        logger = get_root_logger()

        self.ema_decay = train_opt.get('ema_decay', 0)
        if self.ema_decay > 0:
            self.ema_params = jax.tree.map(jnp.array, self.params)

        from bsvd_tpu.losses import build_loss
        self.cri_pix = build_loss(train_opt['pixel_opt'])
        self.lr_schedule = build_schedule(train_opt)

        optim_opt = dict(train_opt['optim_g'])
        optim_opt.pop('type', None)
        betas = optim_opt.get('betas', (0.9, 0.999))

        labels = {k: jax.tree.map(
            lambda _: 'flow' if k == 'spynet' else 'main', v)
            for k, v in self.params.items()}
        self.tx = optax.multi_transform(
            {'main': optax.adam(self.lr_schedule, b1=betas[0], b2=betas[1]),
             'flow': optax.adam(lambda s: self.lr_schedule(s) * flow_lr_mul,
                                b1=betas[0], b2=betas[1])},
            labels)
        self.opt_state = self.tx.init(self.params)

        if self.fix_flow_iter:
            logger.info(f'Fix flow network for the first {self.fix_flow_iter} iters.')

        apply_fn = self.net.apply
        cri_pix = self.cri_pix
        tx = self.tx
        fix_iter = self.fix_flow_iter

        def step(params, opt_state, ema_params, batch, it, ema_decay):
            def loss_fn(p):
                out = apply_fn(p, batch['lq'])
                l_pix = cri_pix(out, batch['gt'])
                return l_pix, {'l_pix': l_pix}
            (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if fix_iter:
                # flow net frozen for iters 1..fix_iter-1: the reference
                # unfreezes at current_iter == fix_flow_iter BEFORE that
                # step's update (video_recurrent_model.py:53-62), so the
                # boundary iteration already trains flow
                flow_on = (it >= fix_iter).astype(jnp.float32)
                grads = dict(grads)
                grads['spynet'] = jax.tree.map(lambda g: g * flow_on,
                                               grads['spynet'])
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_params is not None:
                ema_params = BaseModel.ema_update(ema_params, params,
                                                  ema_decay)
            return params, opt_state, ema_params, loss_dict

        repl = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh, 5, batch_axis=0)
        self._batch_sharding = bsh
        self._train_step = jax.jit(
            step, in_shardings=(repl, repl, repl, {'lq': bsh, 'gt': bsh},
                                None, None),
            out_shardings=(repl, repl, repl, repl), donate_argnums=(0, 1, 2))

    def optimize_parameters(self, current_iter):
        self.current_iter = current_iter
        batch = jax.device_put({'lq': jnp.asarray(self.lq),
                                'gt': jnp.asarray(self.gt)},
                               self._batch_sharding)
        self.params, self.opt_state, self.ema_params, loss_dict = (
            self._train_step(self.params, self.opt_state, self.ema_params,
                             batch, jnp.asarray(current_iter), self.ema_decay))
        self.net.params = self.params
        self.log_dict = self.reduce_loss_dict(loss_dict)

    def feed_data(self, data):
        self.lq = np.asarray(data['lq'])
        self.gt = np.asarray(data['gt']) if 'gt' in data else None
        if self.lq.ndim == 4:       # (T, C, H, W) -> add batch
            self.lq = self.lq[None]
        if self.gt is not None and self.gt.ndim == 4:
            self.gt = self.gt[None]

    def test(self):
        params = self.ema_params if self.ema_params is not None else self.params
        self.output = np.asarray(self.net.apply(params, jnp.asarray(self.lq)))

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """Per-folder whole-clip validation (video_base_model.py:18-108
        without the rank sharding — collectives live inside jit here)."""
        dataset = dataloader.dataset
        dataset_name = dataset.opt['name']
        with_metrics = (self.opt.get('val') or {}).get('metrics') is not None
        metrics = list(self.opt['val']['metrics'].keys()) if with_metrics else []
        results = {}
        for i in range(len(dataset)):
            item = dataset[i]
            folder = item['folder']
            self.feed_data(item)
            self.test()
            out, gt = self.output[0], self.gt[0]
            per_frame = np.zeros((out.shape[0], len(metrics)), np.float32)
            for fi in range(out.shape[0]):
                sr_img = tensor2img(out[fi])
                gt_img = tensor2img(gt[fi])
                if save_img:
                    imwrite(sr_img, osp.join(
                        self.opt['path']['visualization'], dataset_name,
                        folder, f'{fi:08d}.png'))
                for mi, mopt in enumerate(self.opt['val']['metrics'].values()):
                    per_frame[fi, mi] = calculate_metric(
                        {'img': sr_img, 'img2': gt_img}, mopt)
            results[folder] = per_frame.mean(axis=0)
        totals = {m: float(np.mean([v[mi] for v in results.values()]))
                  for mi, m in enumerate(metrics)}
        log = f'Validation {dataset_name}\n' + ''.join(
            f'\t # {m}: {v:.4f}\n' for m, v in totals.items())
        get_root_logger().info(log)
        if tb_logger:
            for m, v in totals.items():
                tb_logger.add_scalar(f'metrics/{m}', v, current_iter)
        return totals
