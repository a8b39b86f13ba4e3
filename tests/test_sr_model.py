"""SRModel end-to-end: paired dataset -> train steps -> validation
(reference flow: BasicSR SRModel + PairedImageDataset)."""

import os

import cv2
import numpy as np
import pytest

from bsvd_tpu.utils.matlab_functions import imresize


@pytest.fixture(scope='module')
def paired_data(tmp_path_factory):
    root = tmp_path_factory.mktemp('srset')
    gt_dir, lq_dir = root / 'gt', root / 'lq'
    os.makedirs(gt_dir)
    os.makedirs(lq_dir)
    rng = np.random.default_rng(0)
    for i in range(4):
        yy, xx = np.mgrid[0:32, 0:32] / 32.0
        img = np.stack([np.sin(4 * np.pi * (xx + yy) + p) * 0.4 + 0.5
                        for p in rng.uniform(0, 6, 3)], axis=-1)
        img += rng.uniform(-0.2, 0.2, img.shape)   # texture: not bilinear-trivial
        gt = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        lq = np.clip(imresize(gt, 0.5), 0, 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f'{i:03d}.png'), gt)
        cv2.imwrite(str(lq_dir / f'{i:03d}.png'), lq)
    return str(gt_dir), str(lq_dir)


def _opt(gt_dir, lq_dir, tmp_path):
    return {
        'name': 'sr_smoke', 'model_type': 'SRModel', 'is_train': True,
        'num_gpu': 2, 'manual_seed': 0, 'scale': 2,
        'network_g': {'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
                      'num_feat': 8, 'num_block': 1, 'upscale': 2},
        'path': {'models': str(tmp_path / 'models'),
                 'training_states': str(tmp_path / 'states'),
                 'visualization': str(tmp_path / 'vis')},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 2e-3, 'betas': [0.9, 0.99]},
            'scheduler': {'type': 'CosineAnnealingRestartLR',
                          'periods': [100], 'restart_weights': [1],
                          'eta_min': 1e-7},
            'total_iter': 10, 'warmup_iter': -1, 'ema_decay': 0.99,
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                          'reduction': 'mean'},
        },
        'val': {'metrics': {'psnr': {'type': 'calculate_psnr',
                                     'crop_border': 2}}},
        'logger': {'print_freq': 100, 'save_checkpoint_freq': 1000,
                   'use_tb_logger': False},
    }


def test_sr_model_train_and_validate(paired_data, tmp_path):
    gt_dir, lq_dir = paired_data
    from bsvd_tpu.data import build_dataloader, build_dataset
    from bsvd_tpu.models import build_model

    opt = _opt(gt_dir, lq_dir, tmp_path)
    os.makedirs(opt['path']['models'], exist_ok=True)
    os.makedirs(opt['path']['training_states'], exist_ok=True)
    model = build_model(opt)

    train_opt = {'name': 'sr_train', 'type': 'PairedImageDataset',
                 'dataroot_gt': gt_dir, 'dataroot_lq': lq_dir, 'scale': 2,
                 'phase': 'train', 'gt_size': 16, 'use_hflip': True,
                 'use_rot': True, 'batch_size_per_gpu': 2, 'manual_seed': 0}
    train_set = build_dataset(train_opt)
    loader = build_dataloader(train_set, train_opt, num_gpu=2)

    import jax
    params_before = jax.tree.map(np.asarray, model.params)
    losses = []
    it = 0
    for _ in range(6):
        for batch in loader:
            it += 1
            model.feed_data(batch)
            model.optimize_parameters(it)
            losses.append(model.log_dict['l_pix'])
            if it >= 10:
                break
        if it >= 10:
            break
    assert all(np.isfinite(v) for v in losses)
    # bilinear-residual init makes the loss tiny from step 0; assert training
    # moved the params and did not diverge
    moved = any(not np.allclose(a, np.asarray(b))
                for a, b in zip(jax.tree.leaves(params_before),
                                jax.tree.leaves(model.params)))
    assert moved
    assert losses[-1] < max(losses[0] * 2, 1e-2)

    val_opt = {'name': 'sr_val', 'type': 'PairedImageDataset',
               'dataroot_gt': gt_dir, 'dataroot_lq': lq_dir, 'scale': 2,
               'phase': 'val'}
    val_set = build_dataset(val_opt)
    val_loader = build_dataloader(val_set, val_opt)
    res = model.validation(val_loader, it, None, save_img=False)
    assert np.isfinite(res['psnr']) and res['psnr'] > 10

    model.save(0, it)
    assert (tmp_path / 'models' / f'net_g_{it}.npz').exists()
