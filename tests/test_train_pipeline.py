"""End-to-end training on synthetic data: loader -> jitted SPMD train step ->
checkpoint/resume (reference flow: SURVEY call stack 3.2)."""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools'))


@pytest.fixture(scope='module')
def train_data(tmp_path_factory):
    from make_synth_dataset import main as make_ds
    root = tmp_path_factory.mktemp('trainset')
    make_ds(str(root), num_clips=3, t=16, h=64, w=64, seed=7)
    return str(root)


def _train_opt(data_dir, tmp_path, total_iter=6, **net_over):
    net2d = {'chns': [16, 32, 64], 'mid_ch': 16, 'shift_input': False,
             'norm': 'none', 'interm_ch': 16, 'act': 'relu6'}
    net2d.update(net_over)
    opt = {
        'name': 'smoke_train',
        'model_type': 'DenoisingModel',
        'num_gpu': 2,
        'manual_seed': 10,
        'datasets': {
            'train': {
                'name': 'synth_train', 'type': 'train_video_loader',
                'trainset_dir': data_dir, 'noise_ival': [5, 55],
                'batch_size_per_gpu': 2, 'temp_patch_size': 5,
                'patch_size': [32, 32], 'max_number_patches': 100,
                'use_shuffle': True, 'noise_shape': 'N', 'num_workers': 2,
            },
            'val': {
                'name': 'synth_val', 'type': 'ValFolderDataset',
                'valsetdir': data_dir, 'num_validation_frames': 6,
                'valnoisestd': 20,
            },
        },
        'network_g': {
            'type': 'TSN', 'num_segments': 5, 'base_model': 'WNet_multistage',
            'shift_type': 'TSM', 'shift_div': 8, 'inplace': False,
            'net2d_opt': net2d,
        },
        'path': {'strict_load_g': True},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 1e-3, 'weight_decay': 0,
                        'betas': [0.9, 0.99]},
            'scheduler': {'type': 'MultiStepLR', 'milestones': [4], 'gamma': 0.7},
            'total_iter': total_iter, 'warmup_iter': -1,
            'ema_decay': 0.99,
            'pixel_opt': {'type': 'MSELoss', 'loss_weight': 1.0,
                          'reduction': 'mean'},
        },
        'val': {'val_freq': None, 'save_img': False, 'temp_psz': 5,
                'future_buffer_len': 2, 'fp16': False,
                'metrics': {'psnr': {'type': 'calculate_psnr', 'crop_border': 2,
                                     'test_y_channel': False}}},
        'logger': {'print_freq': 2, 'save_checkpoint_freq': 4,
                   'use_tb_logger': False},
    }
    p = tmp_path / 'train_opt.yml'
    p.write_text(yaml.safe_dump(opt))
    return str(p)


def test_video_loader_batches(train_data):
    from bsvd_tpu.data import build_dataset
    loader = build_dataset({
        'type': 'train_video_loader', 'trainset_dir': train_data,
        'noise_ival': [5, 55], 'batch_size_per_gpu': 2, 'temp_patch_size': 4,
        'patch_size': [24, 24], 'max_number_patches': 5, 'noise_shape': 'N',
        'num_devices': 2, 'num_workers': 2, 'manual_seed': 3})
    batches = list(loader)
    loader.close()
    assert len(batches) == 5
    b = batches[0]
    assert b['gt'].shape == (4, 4, 3, 24, 24)          # N=2x2 devices
    assert b['lq'].shape == (4, 4, 3, 24, 24)
    assert b['noise_map'].shape == (4, 4, 1, 24, 24)
    # sigma per clip ('N'): constant across frames, in [5,55]/255
    nm = b['noise_map']
    assert np.all(nm.min(axis=(1, 2, 3, 4)) == nm.max(axis=(1, 2, 3, 4)))
    assert np.all(nm >= 5 / 255.) and np.all(nm <= 55 / 255.)
    # lq - gt is noise with roughly the declared std
    noise = b['lq'] - b['gt']
    est = noise.std(axis=(1, 2, 3, 4))
    np.testing.assert_allclose(est, nm[:, 0, 0, 0, 0], rtol=0.2)


def test_train_pipeline_end_to_end(train_data, tmp_path):
    from bsvd_tpu.train import train_pipeline
    opt_path = _train_opt(train_data, tmp_path)
    model = train_pipeline(str(tmp_path), opt_path=opt_path)
    assert 'l_pix' in model.log_dict
    assert np.isfinite(model.log_dict['l_pix'])
    exp = tmp_path / 'experiments' / 'smoke_train'
    models = list((exp / 'models').glob('net_g_*.npz'))
    states = list((exp / 'training_states').glob('*.state'))
    assert any('net_g_4.npz' in str(m) for m in models)
    assert any('latest' in str(m) for m in models)
    assert states, 'training state not saved'

    # checkpoint loads back into an arch
    from bsvd_tpu.convert.torch_ckpt import load_params
    params = load_params(str(exp / 'models' / 'net_g_4.npz'), model.cfg)
    import jax
    assert len(jax.tree.leaves(params)) == len(jax.tree.leaves(model.params))


def test_train_step_loss_decreases(train_data, tmp_path):
    """Direct engine test: repeated steps on one fixed batch reduce the loss."""
    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.models import build_model
    from bsvd_tpu.utils.options import parse_options
    opt_path = _train_opt(train_data, tmp_path)
    opt, _ = parse_options(str(tmp_path), is_train=True, opt_path=opt_path)
    os.makedirs(opt['path']['models'], exist_ok=True)
    os.makedirs(opt['path']['training_states'], exist_ok=True)
    model = build_model(opt)
    loader = build_dataset({**opt['datasets']['train'], 'num_devices': 2,
                            'manual_seed': 0})
    batch = next(iter(loader))
    loader.close()
    losses = []
    for it in range(1, 9):
        model.feed_data(batch)
        model.optimize_parameters(it)
        losses.append(model.log_dict['l_pix'])
    assert losses[-1] < losses[0], losses
