"""DenoisingModel — the train/eval engine for BSVD nets
(reference: Experimental_root/models/denoising_model.py).

Training is one jitted SPMD step: forward + loss + grad + Adam update + EMA,
batch sharded over the device mesh ('data' axis; optional 'spatial' axis on
H), gradients reduced by XLA collectives — replacing the reference's
DataParallel scatter/gather + DDP all-reduce.
"""

import os.path as osp
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bsvd_tpu.archs import build_network
from bsvd_tpu.archs.wnet_arch import wnet_apply
from bsvd_tpu.losses import build_loss
from bsvd_tpu.metrics import calculate_metric
from bsvd_tpu.models.base_model import BaseModel
from bsvd_tpu.models.lr_scheduler import build_schedule
from bsvd_tpu.models.seq_inference import denoise_seq
from bsvd_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from bsvd_tpu.utils import get_root_logger, imwrite, tensor2img
from bsvd_tpu.utils.registry import MODEL_REGISTRY


def _nfchw_to_nthwc(x):
    return jnp.transpose(x, (0, 1, 3, 4, 2))


import functools                                       # noqa: E402


@functools.partial(jax.jit, static_argnums=(2,))
def _jit_wnet_apply(params, x, cfg):
    """Plain whole-batch forward (the reference EMA-branch semantics: no
    clamp, no padding — reference denoising_model.py:173-177)."""
    return wnet_apply(params, x, cfg)


def make_train_step(cfg, tx, cri_pix, cri_perceptual=None,
                    params_template=None, mesh=None, amp=False):
    """Build the pure (params, opt_state, ema, batch, it, ema_decay) update.

    Loss = pixel + perceptual(+style) like the reference optimize_parameters
    (reference denoising_model.py:108-122); each criterion may be None.
    Frames are flattened (N,T,H,W,C) -> (N*T,C,H,W) for the VGG extractor.

    With norm='bn' and a params template, the forward runs train-mode
    BatchNorm and the step folds the running-stat momentum update back into
    the params (torch BN training semantics).

    With ``amp=True`` (config key ``train.fp16`` — the reference wraps its
    train step in ``torch.cuda.amp.autocast``, train_pipeline.py:175) the
    net forward/backward runs in bfloat16 while master params, loss,
    optimizer state and EMA stay fp32 — the TPU-native AMP equivalent
    (bf16 needs no loss scaling). The perceptual (VGG) loss is computed on
    the fp32-cast output. For norm='bn' AMP is disabled: torch autocast
    keeps BN in fp32, and bf16 batch stats would corrupt the fp32 running
    stats; the shipped BSVD train configs use norm='none'."""
    bn_paths = None
    if cfg.norm == 'bn' and params_template is not None:
        from bsvd_tpu.nn.layers import bn_stats_with_paths, bn_training
        resolved_paths = []

        def probe(p):
            coll = []
            with bn_training(coll):
                wnet_apply(p, jnp.zeros((1, 2, 8, 8, cfg.effective_in_ch)), cfg)
            # identity-resolve against the tree as seen inside this trace
            resolved_paths.extend(r[0] for r in bn_stats_with_paths(p, coll))
            return 0
        jax.eval_shape(probe, params_template)
        bn_paths = resolved_paths
    if bn_paths is not None and amp:
        get_root_logger().warning(
            'train.fp16 ignored for norm=bn (BN batch stats stay fp32, '
            'matching autocast BN policy)')
        amp = False

    def loss_fn(params, lq, gt):
        if amp:
            cast = (lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a)
            fwd_params = jax.tree.map(cast, params)
            lq = lq.astype(jnp.bfloat16)
        else:
            fwd_params = params
        if bn_paths is not None:
            from bsvd_tpu.nn.layers import bn_training
            coll = []
            with bn_training(coll):
                out = wnet_apply(fwd_params, lq, cfg)
            stats = [(m, v, n) for (_, m, v, n) in coll]
        else:
            out = wnet_apply(fwd_params, lq, cfg)
            stats = []
        out = out.astype(jnp.float32)
        total = 0.
        losses = {}
        if cri_pix is not None:
            l_pix = cri_pix(out, gt)
            total += l_pix
            losses['l_pix'] = l_pix
        if cri_perceptual is not None:
            def to_nchw(x):   # (N,T,H,W,C) -> (N*T,C,H,W) for the VGG
                x = x.reshape(-1, *x.shape[-3:])
                return jnp.transpose(x, (0, 3, 1, 2))
            l_percep, l_style = cri_perceptual(to_nchw(out), to_nchw(gt))
            if l_percep is not None:
                total += l_percep
                losses['l_percep'] = l_percep
            if l_style is not None:
                total += l_style
                losses['l_style'] = l_style
        return total, (losses, stats)

    def grads_and_losses(params, lq, gt):
        (_, (loss_dict, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, lq, gt)
        return grads, loss_dict, stats

    n_spatial = dict(mesh.shape).get('spatial', 1) if mesh is not None else 1
    if (mesh is not None and mesh.size > 1 and bn_paths is None
            and (n_spatial == 1
                 or (cri_perceptual is None and cfg.norm == 'none'))):
        # shard_map SPMD step: each device runs the forward/backward on ITS
        # shard — this keeps the Pallas kernels usable under a multi-device
        # mesh (GSPMD has no partitioning rules for custom calls and would
        # replicate their operands). Batch rides 'data'; with a 'spatial'
        # axis the frame height additionally shards across it via the
        # halo-exchange forward (parallel/spatial.py) and each shard's
        # pixel loss covers its own rows. Gradients/losses are pmean'd over
        # the mesh; the optimizer then updates replicated params
        # identically on every device. BN configs (global-batch stats) and
        # spatial+perceptual (VGG needs full frames) stay on the GSPMD
        # path below.
        import functools
        from jax.sharding import PartitionSpec as P
        from bsvd_tpu.parallel.mesh import get_shard_map
        shard_map, relax = get_shard_map()
        axes = ('data', 'spatial') if n_spatial > 1 else ('data',)
        bspec = P('data', None, 'spatial') if n_spatial > 1 else P('data')

        if n_spatial > 1:
            from bsvd_tpu.parallel.spatial import _local_forward

            def local_loss(p, lq_loc, gt_loc):
                if amp:
                    cast = (lambda a: a.astype(jnp.bfloat16)
                            if a.dtype == jnp.float32 else a)
                    p = jax.tree.map(cast, p)
                    lq_loc = lq_loc.astype(jnp.bfloat16)
                hg = lq_loc.shape[2] * n_spatial
                out = _local_forward(p, lq_loc, cfg, hg, 'spatial')
                out = out.astype(jnp.float32)
                l_pix = cri_pix(out, gt_loc)
                return l_pix, {'l_pix': l_pix}

            def shard_grads_fn(p, lq, gt):
                (_, loss_dict), grads = jax.value_and_grad(
                    local_loss, has_aux=True)(p, lq, gt)
                return grads, loss_dict
        else:
            def shard_grads_fn(p, lq, gt):
                grads, loss_dict, _ = grads_and_losses(p, lq, gt)
                return grads, loss_dict

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), bspec, bspec),
            out_specs=(P(), P()),
            **relax)
        def sharded_grads(p, lq, gt):
            grads, loss_dict = shard_grads_fn(p, lq, gt)
            grads = jax.lax.pmean(grads, axes)
            loss_dict = jax.lax.pmean(loss_dict, axes)
            return grads, loss_dict

        def step(params, opt_state, ema_params, batch, it, ema_decay):
            grads, loss_dict = sharded_grads(params, batch['lq'],
                                             batch['gt'])
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_params is not None:
                ema_params = BaseModel.ema_update(ema_params, params,
                                                  ema_decay)
            return params, opt_state, ema_params, loss_dict

        return step

    if n_spatial > 1:
        # GSPMD fallback (BN / spatial+perceptual): custom calls have no
        # partitioning rules -> run the XLA conv path
        import dataclasses
        import logging
        logging.getLogger('bsvd_tpu').warning(
            'spatial-mesh train step with BN or a perceptual loss: fused '
            'Pallas kernels disabled (GSPMD cannot partition custom calls) '
            '— the step runs XLA convs (~3x slower forward per shard, '
            'PERF.md "Spatial-mesh fallback cost"). Use norm="none" + pixel '
            'losses to keep the fused halo-exchange path.')
        cfg = dataclasses.replace(cfg, use_fused=False)

    def step(params, opt_state, ema_params, batch, it, ema_decay):
        grads, loss_dict, stats = grads_and_losses(params, batch['lq'],
                                                   batch['gt'])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if bn_paths is not None:
            from bsvd_tpu.nn.layers import bn_fold_running_stats
            params = bn_fold_running_stats(
                params, [(p, m, v, n) for p, (m, v, n) in zip(bn_paths, stats)])
        if ema_params is not None:
            ema_params = BaseModel.ema_update(ema_params, params, ema_decay)
        return params, opt_state, ema_params, loss_dict

    return step


@MODEL_REGISTRY.register()
class DenoisingModel(BaseModel):
    """Video denoising engine: MIMO training with temporal shift, chunked or
    whole-clip validation, streaming-equivalent test inference."""

    def __init__(self, opt):
        super().__init__(opt)
        self.net = build_network(opt['network_g'])
        self.cfg = self.net.cfg
        self.center_frame_only = opt.get('center_frame_only', False)
        self.print_network(self.net)

        load_path = self.opt['path'].get('pretrain_network_g', None)
        if load_path is not None:
            param_key = self.opt['path'].get('param_key_g', 'params')
            if param_key == 'None':
                param_key = None
            self.net.params = self.load_network(
                self.cfg, load_path, self.opt['path'].get('strict_load_g', True),
                param_key)

        self.params = self.net.params
        self.ema_params = None
        self.current_iter = 0

        # device mesh: data ( x spatial) — one mesh for train and eval
        par = dict(opt.get('parallel') or {})
        self.mesh = make_mesh(opt.get('num_gpu', 'auto'),
                              spatial=int(par.get('spatial', 1)))
        # Spatial meshes keep the fused Pallas kernels: train and whole-clip
        # eval run them per-shard inside shard_map with explicit halo
        # exchange (parallel/spatial.py); only the GSPMD-partitioned
        # fallbacks (chunked protocols, BN, spatial+perceptual) flip
        # use_fused off locally, since GSPMD has no partitioning rules for
        # custom calls (see make_train_step / seq_inference.denoise_seq).

        if self.is_train:
            self.init_training_settings()

    # ------------------------------------------------------------------ #
    def init_training_settings(self):
        train_opt = self.opt['train']
        logger = get_root_logger()

        self.ema_decay = train_opt.get('ema_decay', 0)
        if self.ema_decay > 0:
            logger.info(f'Use EMA with decay: {self.ema_decay}')
            load_path = self.opt['path'].get('pretrain_network_g', None)
            if load_path is not None:
                self.ema_params = self.load_network(
                    self.cfg, load_path,
                    self.opt['path'].get('strict_load_g', True), 'params_ema')
            else:
                self.ema_params = jax.tree.map(jnp.array, self.params)

        if train_opt.get('pixel_opt'):
            self.cri_pix = build_loss(train_opt['pixel_opt'])
        else:
            self.cri_pix = None
        if train_opt.get('perceptual_opt'):
            self.cri_perceptual = build_loss(train_opt['perceptual_opt'])
        else:
            self.cri_perceptual = None
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError('Both pixel and perceptual losses are None.')

        self.lr_schedule = build_schedule(train_opt)
        self.tx = self._build_optimizer(train_opt)
        self.opt_state = self.tx.init(self.params)

        amp = bool(train_opt.get('fp16', False))
        if amp:
            logger.info('Mixed-precision training: bf16 compute, fp32 '
                        'master params/optimizer (reference '
                        'train_pipeline.py:175 autocast equivalent)')
        step = make_train_step(self.cfg, self.tx, self.cri_pix,
                               cri_perceptual=self.cri_perceptual,
                               params_template=self.params, mesh=self.mesh,
                               amp=amp)
        repl = replicated_sharding(self.mesh)
        bsh5 = batch_sharding(self.mesh, 5, batch_axis=0, spatial_axis=2)
        self._train_step = jax.jit(
            step,
            in_shardings=(repl, repl, repl, {'lq': bsh5, 'gt': bsh5},
                          None, None),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1, 2))
        self._batch_sharding = bsh5

    def _build_optimizer(self, train_opt):
        optim_opt = dict(train_opt['optim_g'])
        optim_type = optim_opt.pop('type')
        lr = self.lr_schedule
        betas = optim_opt.get('betas', (0.9, 0.999))
        wd = optim_opt.get('weight_decay', 0)
        if optim_type != 'Adam':
            raise NotImplementedError(f'optimizer {optim_type} is not supported yet.')
        if wd:
            opt = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=wd)
        else:
            opt = optax.adam(lr, b1=betas[0], b2=betas[1])
        # NOTE: the reference config declares `gradient_clipping: 5` but the
        # reference code never applies it (no clip call in its train path) —
        # we apply clipping only when `use_grad_clip: true` is set, keeping
        # default behavior faithful.
        if train_opt.get('use_grad_clip', False):
            clip = float(train_opt.get('gradient_clipping', 5))
            opt = optax.chain(optax.clip_by_global_norm(clip), opt)
        return opt

    # ------------------------------------------------------------------ #
    def feed_data(self, data):
        """Accepts host arrays; lq/gt (N,F,C,H,W) or (F,C,H,W),
        noise_map (N,F,1,H,W) or (F,1,H,W)."""
        def squeeze_val(a):
            a = np.asarray(a)
            return a[0] if (a.ndim == 5 and not self.is_train) else a
        self.lq = squeeze_val(data['lq'])
        self.noise_map = squeeze_val(data['noise_map']) if 'noise_map' in data else None
        self.gt = squeeze_val(data['gt']) if 'gt' in data else None

    def optimize_parameters(self, current_iter):
        self.current_iter = current_iter
        lq = jnp.asarray(self.lq)
        gt = jnp.asarray(self.gt)
        if self.noise_map is not None:
            lq = jnp.concatenate([lq, jnp.asarray(self.noise_map)], axis=2)
        batch = {'lq': _nfchw_to_nthwc(lq), 'gt': _nfchw_to_nthwc(gt)}
        batch = jax.device_put(batch, self._batch_sharding)

        self.params, self.opt_state, self.ema_params, loss_dict = (
            self._train_step(self.params, self.opt_state, self.ema_params,
                             batch, current_iter, self.ema_decay))
        self.net.params = self.params
        self.log_dict = self.reduce_loss_dict(loss_dict)

    # ------------------------------------------------------------------ #
    def padding_input(self, seq):
        """Reflect-pad H, W to multiples of 16 — covers the reference's
        two-downsample requirement (multiple of 4, reference
        denoising_model.py:133-159) AND keeps the width-folded W a multiple
        of 8, which the Pallas kernels' HBM row DMAs require (Mosaic
        rejects logically-unaligned full-width slices: DAVIS 854 -> pad 856
        -> folded 428 failed at compile). Exactness-neutral: the extra
        reflect border is cropped by crop_output."""
        window_size = 16
        _, _, h, w = seq.shape
        mod_pad_h = (window_size - h % window_size) % window_size
        mod_pad_w = (window_size - w % window_size) % window_size
        padded = np.pad(np.asarray(seq),
                        ((0, 0), (0, 0), (0, mod_pad_h), (0, mod_pad_w)),
                        mode='reflect')
        padding_list = [0, mod_pad_w, 0, mod_pad_h, 0, 0]
        return padded, padding_list

    def crop_output(self, padding_list):
        pad_w1, pad_w2, pad_h1, pad_h2, tp1, tp2 = padding_list
        _, f, _, h, w = self.output.shape
        self.output = self.output[:, tp1:f - tp2, :, pad_h1:h - pad_h2,
                                  pad_w1:w - pad_w2]

    def test(self):
        """Full-sequence inference with padding, using the configured
        protocol (temp_psz / future_buffer_len / streaming_eval / fp16).

        ``val.reference_ema_branch: true`` reproduces the reference's EMA
        test() branch EXACTLY (reference denoising_model.py:170-178): when
        an EMA net exists, ONE plain whole-batch forward on the UNPADDED
        input — no reflect padding, no temp_psz chunking, no [0,1] clamp.
        Default (false) keeps this framework's pinned behavior: the EMA
        params run the same padded protocol as the raw net."""
        val_opt = self.opt.get('val') or {}
        params = self.ema_params if self.ema_params is not None else self.params

        if (self.ema_params is not None
                and val_opt.get('reference_ema_branch', False)):
            lq = np.asarray(self.lq)
            if lq.ndim == 4:
                lq = lq[None]
            x = jnp.asarray(lq)
            if self.noise_map is not None:
                nm = np.asarray(self.noise_map)
                if nm.ndim == 4:
                    nm = nm[None]
                x = jnp.concatenate([x, jnp.asarray(nm)], axis=2)
            if val_opt.get('fp16', False):
                x = x.astype(jnp.bfloat16)
            out = _jit_wnet_apply(self.ema_params, _nfchw_to_nthwc(x),
                                  self.cfg)
            self.output = np.asarray(
                jnp.transpose(out, (0, 1, 4, 2, 3)), np.float32)
            return

        # val items are (1,T,C,H,W); during-training validation reaches here
        # without feed_data's eval-mode squeeze — drop the batch dim either way
        lq = self.lq[0] if np.ndim(self.lq) == 5 else self.lq
        padded_lq, padding_list = self.padding_input(lq)
        sigma = None
        if self.noise_map is not None:
            nm = np.asarray(self.noise_map)
            sigma = float(nm.reshape(-1)[0])
        compute_dtype = jnp.bfloat16 if val_opt.get('fp16', False) else None
        mode = 'streaming' if val_opt.get('streaming_eval', False) else 'mimo'
        out = denoise_seq(params, self.cfg, padded_lq, noise_sigma=sigma,
                          temp_psz=val_opt.get('temp_psz', -1),
                          future_buffer_len=val_opt.get('future_buffer_len', 0),
                          mode=mode, compute_dtype=compute_dtype,
                          mesh=self.mesh)
        self.output = out[None, ...]
        self.crop_output(padding_list)

    # ------------------------------------------------------------------ #
    def validation(self, dataloader, current_iter, tb_logger, save_img=False):
        from bsvd_tpu.parallel.mesh import is_main_process
        if not is_main_process():
            # multi-host: validation runs on the coordinator only (the
            # reference's dist validation is likewise rank-0 only,
            # reference denoising_model.py:211-213); within the process it
            # still fans folders out over the local mesh devices
            return None
        return self.nondist_validation(dataloader, current_iter, tb_logger,
                                       save_img)

    def _val_data_parallel_devices(self):
        """Devices to fan val folders out over: the mesh 'data' axis of a
        single-process, spatial-free mesh; [] = run serial."""
        if self.mesh is None or jax.process_count() > 1:
            return []
        shape = dict(self.mesh.shape)
        if shape.get('spatial', 1) > 1 or shape.get('data', 1) <= 1:
            return []
        return list(self.mesh.devices.reshape(-1))

    def _folder_metrics(self, result, gt, folder, dataset_name, save_img,
                        with_metrics, metric_data, metric_data_float):
        """Per-frame tensor2img + metric accumulation for one folder
        (reference denoising_model.py:260-316)."""
        if self.center_frame_only:
            result = result[result.shape[0] // 2:result.shape[0] // 2 + 1]
            gt = gt[gt.shape[0] // 2:gt.shape[0] // 2 + 1]

        for idx in range(result.shape[0]):
            result_img = tensor2img(result[idx])       # uint8 bgr
            gt_img = tensor2img(gt[idx])
            metric_data['img'] = result_img
            metric_data['img2'] = gt_img
            metric_data_float['img_float'] = result[idx]
            metric_data_float['img2_float'] = gt[idx]

            if save_img:
                img_path = osp.join(self.opt['path']['visualization'],
                                    dataset_name, folder,
                                    f"{idx:08d}_{self.opt['name']}.png")
                imwrite(result_img, img_path)

            if with_metrics:
                for m_idx, opt_ in enumerate(self.opt['val']['metrics'].values()):
                    if 'float' in opt_['type']:
                        val = calculate_metric(metric_data_float, opt_)
                    else:
                        val = calculate_metric(metric_data, opt_)
                    self.metric_results[folder][idx, m_idx] += val

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        dataset = dataloader.dataset
        dataset_name = dataset.opt['name']
        val_opt = self.opt.get('val') or {}
        with_metrics = val_opt.get('metrics') is not None
        metric_data, metric_data_float = {}, {}
        if with_metrics:
            # center_frame_only scores ONE frame per clip — size the
            # accumulator to the frames actually written, or the mean over
            # rows silently divides by the full clip length
            self.metric_results = {
                folder: np.zeros((1 if self.center_frame_only
                                  else dataset.num_frames[index],
                                  len(self.opt['val']['metrics'])), np.float32)
                for index, folder in enumerate(dataset.base_folder)}

        num_folders = len(dataset)
        logger = get_root_logger()

        # Data-parallel validation: fan folders out over the mesh 'data'
        # devices round-robin — denoise dispatches are async, so up to
        # n_dev folders are in flight while the host computes metrics for
        # the oldest (the reference shards folders across ranks in dist
        # eval, video_base_model.py:18-108; here one controller drives all
        # chips). Whole-clip protocols only: the chunked path syncs per
        # chunk internally.
        devices = (self._val_data_parallel_devices()
                   if val_opt.get('temp_psz', -1) == -1 and num_folders > 1
                   else [])
        if devices:
            from collections import deque
            from bsvd_tpu.models.seq_inference import denoise_seq_async
            params = (self.ema_params if self.ema_params is not None
                      else self.params)
            params_by_dev = [jax.device_put(params, d) for d in devices]
            compute_dtype = (jnp.bfloat16 if val_opt.get('fp16', False)
                             else None)
            mode = ('streaming' if val_opt.get('streaming_eval', False)
                    else 'mimo')
            pending = deque()

            def finish(entry):
                i, folder, gt, out_dev, padding_list = entry
                out = np.asarray(out_dev, np.float32)          # sync point
                self.output = np.transpose(out, (0, 3, 1, 2))[None]
                self.crop_output(padding_list)
                self._folder_metrics(self.output[0], gt, folder,
                                     dataset_name, save_img, with_metrics,
                                     metric_data, metric_data_float)
                logger.info(f'Tested {folder} ({i + 1}/{num_folders})')

            for i in range(num_folders):
                val_data = dataset[i]
                self.feed_data(val_data)
                lq = self.lq[0] if np.ndim(self.lq) == 5 else self.lq
                padded_lq, padding_list = self.padding_input(lq)
                sigma = None
                if self.noise_map is not None:
                    sigma = float(np.asarray(self.noise_map).reshape(-1)[0])
                d = i % len(devices)
                out_dev = denoise_seq_async(
                    params_by_dev[d], self.cfg, padded_lq, noise_sigma=sigma,
                    mode=mode, compute_dtype=compute_dtype,
                    device=devices[d])
                pending.append((i, val_data['folder'],
                                np.asarray(val_data['gt'])[0], out_dev,
                                padding_list))
                if len(pending) >= len(devices):
                    finish(pending.popleft())
            while pending:
                finish(pending.popleft())
        else:
            for i in range(num_folders):
                val_data = dataset[i]
                folder = val_data['folder']
                self.feed_data(val_data)
                self.test()
                self._folder_metrics(self.output[0],
                                     np.asarray(val_data['gt'])[0], folder,
                                     dataset_name, save_img, with_metrics,
                                     metric_data, metric_data_float)
                logger.info(f'Tested {folder} ({i + 1}/{num_folders})')
        # Aggregate/log ONCE after all folders (reference
        # denoising_model.py:318-367) — logging inside the loop would average
        # in all-zero rows for folders not yet evaluated and rewrite the
        # per-scene CSVs N times.
        return self._log_validation_metric_values(
            current_iter, dataset_name, tb_logger)

    def _log_validation_metric_values(self, current_iter, dataset_name, tb_logger):
        logger = get_root_logger()
        metric_results_avg = {folder: arr.mean(axis=0)
                              for folder, arr in self.metric_results.items()}

        # per-scene per-frame CSVs next to the log (reference
        # denoising_model.py:335-345)
        log_dir = self.opt['path'].get('log')
        if log_dir:
            import pandas as pd
            for folder, arr in self.metric_results.items():
                df = pd.DataFrame({f'{folder}_{m}': arr[:, m]
                                   for m in range(arr.shape[1])})
                df.to_csv(osp.join(log_dir, f'{dataset_name}_{folder}.csv'))

        metrics = list(self.opt['val']['metrics'].keys())
        total_avg_results = {m: 0.0 for m in metrics}
        for folder, avg in metric_results_avg.items():
            for idx, metric in enumerate(metrics):
                total_avg_results[metric] += float(avg[idx])
        for metric in metrics:
            total_avg_results[metric] /= max(len(metric_results_avg), 1)

        log_str = f'Validation {dataset_name}\n'
        for m_idx, (metric, value) in enumerate(total_avg_results.items()):
            log_str += f'\t # {metric}: {value:.4f}'
            for folder, avg in metric_results_avg.items():
                log_str += f'\t # {folder}: {avg[m_idx]:.4f}'
            log_str += '\n'
        logger.info(log_str)
        if tb_logger:
            for m_idx, (metric, value) in enumerate(total_avg_results.items()):
                tb_logger.add_scalar(f'metrics/{metric}', value, current_iter)
                for folder, avg in metric_results_avg.items():
                    tb_logger.add_scalar(f'metrics/{metric}/{folder}',
                                         float(avg[m_idx]), current_iter)
        return total_avg_results

    def get_current_visuals(self):
        out = OrderedDict()
        out['lq'] = np.asarray(self.lq)
        out['result'] = np.asarray(self.output)
        if self.gt is not None:
            out['gt'] = np.asarray(self.gt)
        return out

    # ------------------------------------------------------------------ #
    def save(self, epoch, current_iter):
        if self.ema_params is not None:
            self.save_network([self.params, self.ema_params], 'g', current_iter,
                              param_key=['params', 'params_ema'])
        else:
            self.save_network(self.params, 'g', current_iter)
        self.save_training_state(epoch, current_iter, opt_state=self.opt_state)

    # resume_training: inherited from BaseModel (optimizer state only;
    # schedulers are stateless functions of the iter counter).
