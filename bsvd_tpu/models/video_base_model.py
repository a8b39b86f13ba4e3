"""VideoBaseModel + EDVRModel — sliding-window video restoration engines
(reference: BasicSR/basicsr/models/video_base_model.py:14-148 and
edvr_model.py:6-62).

VideoBaseModel evaluates per-folder over a sliding-window VideoTestDataset
(each item: T-frame window -> center frame). EDVRModel adds the training
schedule: DCN-alignment lr multiplier and an optional TSA-only warm phase
(gradient gating on the step counter, like the flow freeze in
VideoRecurrentModel)."""

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
class VideoBaseModel(SRModel):
    """Sliding-window eval: items carry (T, C, H, W) windows; the model
    restores the center frame."""

    def feed_data(self, data):
        self.lq = np.asarray(data['lq'])
        if self.lq.ndim == 4:
            self.lq = self.lq[None]
        self.gt = None
        if 'gt' in data:
            self.gt = np.asarray(data['gt'])
            if self.gt.ndim == 3:
                self.gt = self.gt[None]

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        dataset = dataloader.dataset
        dataset_name = dataset.opt['name']
        metrics = list((self.opt.get('val') or {}).get('metrics', {}).keys())
        folder_results = {}
        for i in range(len(dataset)):
            item = dataset[i]
            folder = item['folder']
            self.feed_data(item)
            self.test()
            sr_img = tensor2img(self.output[0])
            gt_img = tensor2img(self.gt[0]) if self.gt is not None else None
            if save_img:
                frame_idx = item.get('idx', f'{i}').split('/')[0]
                imwrite(sr_img, osp.join(self.opt['path']['visualization'],
                                         dataset_name, folder,
                                         f'{frame_idx}_{self.opt["name"]}.png'))
            if metrics and gt_img is not None:
                vals = [calculate_metric({'img': sr_img, 'img2': gt_img}, mopt)
                        for mopt in self.opt['val']['metrics'].values()]
                folder_results.setdefault(folder, []).append(vals)
        totals = {}
        if folder_results:
            per_folder = {f: np.mean(v, axis=0) for f, v in folder_results.items()}
            for mi, m in enumerate(metrics):
                totals[m] = float(np.mean([v[mi] for v in per_folder.values()]))
            log = f'Validation {dataset_name}\n' + ''.join(
                f'\t # {m}: {v:.4f}\n' for m, v in totals.items())
            get_root_logger().info(log)
            if tb_logger:
                for m, v in totals.items():
                    tb_logger.add_scalar(f'metrics/{m}', v, current_iter)
        return totals


@MODEL_REGISTRY.register()
class EDVRModel(VideoBaseModel):

    def init_training_settings(self):
        train_opt = self.opt['train']
        logger = get_root_logger()
        self.ema_decay = train_opt.get('ema_decay', 0)
        if self.ema_decay > 0:
            self.ema_params = jax.tree.map(jnp.array, self.params)

        from bsvd_tpu.losses import build_loss
        self.cri_pix = build_loss(train_opt['pixel_opt'])
        self.lr_schedule = build_schedule(train_opt)
        self.tsa_iter = train_opt.get('tsa_iter', 0)
        dcn_lr_mul = train_opt.get('dcn_lr_mul', 1)
        if dcn_lr_mul != 1:
            logger.info(f'Multiple the learning rate for dcn with {dcn_lr_mul}.')

        betas = dict(train_opt['optim_g']).get('betas', (0.9, 0.999))
        labels = {k: jax.tree.map(
            lambda _: 'dcn' if k == 'pcd_align' else 'main', v)
            for k, v in self.params.items()}
        self.tx = optax.multi_transform(
            {'main': optax.adam(self.lr_schedule, b1=betas[0], b2=betas[1]),
             'dcn': optax.adam(lambda s: self.lr_schedule(s) * dcn_lr_mul,
                               b1=betas[0], b2=betas[1])},
            labels)
        self.opt_state = self.tx.init(self.params)
        if self.tsa_iter:
            logger.info(f'Only train TSA module for {self.tsa_iter} iters.')

        apply_fn = self.net.apply
        cri_pix = self.cri_pix
        tx = self.tx
        tsa_iter = self.tsa_iter

        def step(params, opt_state, ema_params, batch, it, ema_decay):
            def loss_fn(p):
                out = apply_fn(p, batch['lq'])
                l_pix = cri_pix(out, batch['gt'])
                return l_pix, {'l_pix': l_pix}
            (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if tsa_iter:
                # TSA warm phase covers iters 1..tsa_iter-1 only: the
                # reference unfreezes at current_iter == train_tsa_iter
                # BEFORE that step's update (edvr_model.py:49-60)
                warm = (it < tsa_iter)
                gate = jnp.where(warm, 0.0, 1.0)
                grads = {k: (v if k == 'fusion' else
                             jax.tree.map(lambda g: g * gate, v))
                         for k, v in grads.items()}
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_params is not None:
                ema_params = BaseModel.ema_update(ema_params, params,
                                                  ema_decay)
            return params, opt_state, ema_params, loss_dict

        repl = replicated_sharding(self.mesh)
        bsh5 = batch_sharding(self.mesh, 5, batch_axis=0)
        bsh4 = batch_sharding(self.mesh, 4, batch_axis=0)
        self._batch_sharding = {'lq': bsh5, 'gt': bsh4}
        self._train_step = jax.jit(
            step, in_shardings=(repl, repl, repl, self._batch_sharding,
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
