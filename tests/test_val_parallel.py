"""Data-parallel validation: folders fanned out over the mesh 'data' axis
(async round-robin dispatch, metrics gathered on host) must produce the
same per-folder metrics and per-scene CSVs as the serial path.
(Reference counterpart: folder-sharded dist eval,
BasicSR/basicsr/models/video_base_model.py:18-108.)
"""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools'))


@pytest.fixture(scope='module')
def synth_data(tmp_path_factory):
    from make_synth_dataset import main as make_ds
    root = tmp_path_factory.mktemp('valpar')
    make_ds(str(root), num_clips=3, t=6, h=32, w=32, seed=7)
    return str(root)


def _opt_yaml(data_dir, tmp_path, num_gpu):
    opt = {
        'name': 'valpar_eval',
        'model_type': 'DenoisingModel',
        'num_gpu': num_gpu,
        'manual_seed': 10,
        'datasets': {
            'val_1': {
                'name': 'synth_20',
                'type': 'ValFolderDataset',
                'valsetdir': data_dir,
                'num_validation_frames': 6,
                'valnoisestd': 20,
            },
        },
        'network_g': {
            'type': 'BSVD',
            'chns': [8, 16, 32], 'mid_ch': 8, 'shift_input': False,
            'norm': 'none', 'interm_ch': 8, 'act': 'relu6',
            'pretrain_ckpt': None,
        },
        'path': {'pretrain_network_g': None, 'strict_load_g': True,
                 'resume_state': None},
        'val': {
            'save_img': False, 'temp_psz': -1, 'future_buffer_len': 0,
            'fp16': False,
            'metrics': {
                'psnr': {'type': 'calculate_psnr', 'crop_border': 2,
                         'test_y_channel': False},
                'psnr_float': {'type': 'calculate_psnr_float',
                               'crop_border': 2, 'test_y_channel': False},
            },
        },
        'logger': {'print_freq': 100, 'save_checkpoint_freq': 5000,
                   'use_tb_logger': False},
    }
    p = tmp_path / f'opt_{num_gpu}.yml'
    p.write_text(yaml.safe_dump(opt))
    return str(p)


def test_data_parallel_validation_matches_serial(synth_data, tmp_path):
    from bsvd_tpu.test import test_pipeline

    root_s = tmp_path / 'serial'
    root_p = tmp_path / 'parallel'
    root_s.mkdir()
    root_p.mkdir()
    res_serial = test_pipeline(str(root_s),
                               opt_path=_opt_yaml(synth_data, root_s, 1))
    res_par = test_pipeline(str(root_p),
                            opt_path=_opt_yaml(synth_data, root_p, 8))

    assert set(res_serial['synth_20']) == set(res_par['synth_20'])
    for k in res_serial['synth_20']:
        np.testing.assert_allclose(res_par['synth_20'][k],
                                   res_serial['synth_20'][k],
                                   rtol=1e-6, atol=1e-6)

    # per-scene CSVs byte-for-byte structure: same folders, same values
    import pandas as pd
    csv_s = sorted((root_s / 'results' / 'valpar_eval').glob('*.csv'))
    csv_p = sorted((root_p / 'results' / 'valpar_eval').glob('*.csv'))
    assert [c.name for c in csv_s] == [c.name for c in csv_p]
    assert len(csv_s) == 3
    for a, b in zip(csv_s, csv_p):
        da, db = pd.read_csv(a), pd.read_csv(b)
        assert list(da.columns) == list(db.columns)
        np.testing.assert_allclose(db.values, da.values, rtol=1e-6,
                                   atol=1e-6)


def test_val_parallel_device_gate():
    """Spatial meshes and multi-host runs stay on the serial path."""
    from bsvd_tpu.models.denoising_model import DenoisingModel
    from bsvd_tpu.parallel.mesh import make_mesh

    m = DenoisingModel.__new__(DenoisingModel)
    m.mesh = make_mesh(8, spatial=2)
    assert m._val_data_parallel_devices() == []
    m.mesh = make_mesh(8, spatial=1)
    assert len(m._val_data_parallel_devices()) == 8
    m.mesh = make_mesh(1)
    assert m._val_data_parallel_devices() == []
