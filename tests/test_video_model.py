"""VideoRecurrentModel end-to-end: REDS-layout synthetic data -> BasicVSR
train steps (with flow freeze) -> per-folder validation."""

import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools'))


@pytest.fixture(scope='module')
def reds_data(tmp_path_factory):
    from make_synth_dataset import make_clip
    root = tmp_path_factory.mktemp('redsset')
    for c in range(2):
        gt_dir = root / 'gt' / f'{c:03d}'
        lq_dir = root / 'lq' / f'{c:03d}'
        os.makedirs(gt_dir)
        os.makedirs(lq_dir)
        frames = make_clip(c, t=4, h=136, w=136)
        for i, f in enumerate(frames):
            cv2.imwrite(str(gt_dir / f'{i:08d}.png'),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            lq = cv2.resize(f, (34, 34), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(lq_dir / f'{i:08d}.png'),
                        cv2.cvtColor(lq, cv2.COLOR_RGB2BGR))
    return str(root / 'gt'), str(root / 'lq')


def test_video_recurrent_model(reds_data, tmp_path):
    gt_root, lq_root = reds_data
    from bsvd_tpu.data import build_dataloader, build_dataset
    from bsvd_tpu.models import build_model

    opt = {
        'name': 'vsr_smoke', 'model_type': 'VideoRecurrentModel',
        'is_train': True, 'num_gpu': 1, 'manual_seed': 0, 'scale': 4,
        'network_g': {'type': 'BasicVSR', 'num_feat': 8, 'num_block': 1},
        'path': {'models': str(tmp_path / 'models'),
                 'training_states': str(tmp_path / 'states'),
                 'visualization': str(tmp_path / 'vis')},
        'train': {'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
                  'total_iter': 4, 'fix_flow': 2, 'flow_lr_mul': 0.125,
                  'pixel_opt': {'type': 'CharbonnierLoss', 'loss_weight': 1.0,
                                'reduction': 'mean', 'eps': 1e-12}},
        'val': {'metrics': {'psnr': {'type': 'calculate_psnr',
                                     'crop_border': 0}}},
        'logger': {},
    }
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])
    model = build_model(opt)

    train_opt = {'name': 'reds_train', 'type': 'REDSRecurrentDataset',
                 'dataroot_gt': gt_root, 'dataroot_lq': lq_root, 'scale': 4,
                 'phase': 'train', 'gt_size': 64, 'num_frame': 2,
                 'manual_seed': 0}
    ds = build_dataset(train_opt)
    import jax
    spy_before = np.asarray(jax.tree.leaves(model.params['spynet'])[0])
    for it in range(1, 4):
        batch = ds[it]
        model.feed_data({'lq': batch['lq'][None], 'gt': batch['gt'][None]})
        model.optimize_parameters(it)
        assert np.isfinite(model.log_dict['l_pix'])
    spy_mid = np.asarray(jax.tree.leaves(model.params['spynet'])[0])
    # iters 1-2 fixed: spynet unchanged until iter 3 ran (which trains flow)
    model.optimize_parameters(4)
    spy_after = np.asarray(jax.tree.leaves(model.params['spynet'])[0])
    assert not np.array_equal(spy_mid, spy_before) or not np.array_equal(
        spy_after, spy_mid), 'spynet never trained after unfreeze'

    val_opt = {'name': 'reds_val', 'type': 'VideoRecurrentTestDataset',
               'dataroot_gt': gt_root, 'dataroot_lq': lq_root,
               'num_frame': 3}
    val_set = build_dataset(val_opt)
    val_loader = build_dataloader(val_set, val_opt)
    res = model.nondist_validation(val_loader, 4, None, save_img=False)
    assert np.isfinite(res['psnr'])
