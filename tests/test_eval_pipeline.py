"""End-to-end evaluation pipeline on synthetic data: options -> dataset ->
DenoisingModel -> metrics/CSVs/visualization, exercising the full
run_test.py surface (reference flow: SURVEY call stack 3.1)."""

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
    root = tmp_path_factory.mktemp('synthset')
    make_ds(str(root), num_clips=2, t=8, h=48, w=48, seed=0)
    return str(root)


def _opt_yaml(data_dir, tmp_path, **overrides):
    opt = {
        'name': 'smoke_eval',
        'model_type': 'DenoisingModel',
        'num_gpu': 1,
        'manual_seed': 10,
        'datasets': {
            'val_1': {
                'name': 'synth_20',
                'type': 'ValFolderDataset',
                'valsetdir': data_dir,
                'num_validation_frames': 8,
                'valnoisestd': 20,
            },
        },
        'network_g': {
            'type': 'BSVD',
            'chns': [16, 32, 64], 'mid_ch': 16, 'shift_input': False,
            'norm': 'none', 'interm_ch': 16, 'act': 'relu6',
            'pretrain_ckpt': None,
        },
        'path': {'pretrain_network_g': None, 'strict_load_g': True,
                 'resume_state': None},
        'val': {
            'save_img': True, 'temp_psz': -1, 'future_buffer_len': 0,
            'fp16': False,
            'metrics': {
                'psnr': {'type': 'calculate_psnr', 'crop_border': 2,
                         'test_y_channel': False},
                'psnr_float': {'type': 'calculate_psnr_float', 'crop_border': 2,
                               'test_y_channel': False},
                'ssim': {'type': 'calculate_ssim', 'crop_border': 2,
                         'test_y_channel': False},
            },
        },
        'logger': {'print_freq': 100, 'save_checkpoint_freq': 5000,
                   'use_tb_logger': False},
    }
    for k, v in overrides.items():
        opt[k] = v
    p = tmp_path / 'opt.yml'
    p.write_text(yaml.safe_dump(opt))
    return str(p)


def test_eval_pipeline_end_to_end(synth_data, tmp_path):
    from bsvd_tpu.test import test_pipeline
    opt_path = _opt_yaml(synth_data, tmp_path)
    results = test_pipeline(str(tmp_path), opt_path=opt_path)
    assert 'synth_20' in results
    res = results['synth_20']
    # random-weight net does not denoise; metrics must still be computed & finite
    assert set(res) == {'psnr', 'psnr_float', 'ssim'}
    assert all(np.isfinite(v) for v in res.values())
    # artifacts: results dir with log, per-scene CSVs, visualization pngs
    results_root = tmp_path / 'results' / 'smoke_eval'
    assert (results_root / 'visualization').is_dir()
    csvs = list(results_root.glob('*.csv'))
    assert len(csvs) == 2, f'expected 2 per-scene CSVs, got {csvs}'
    pngs = list((results_root / 'visualization').rglob('*.png'))
    assert len(pngs) == 16  # 2 clips x 8 frames


def test_eval_identity_net_psnr(synth_data, tmp_path):
    """With an identity net output==lq; PSNR must match the noise level
    (sigma=20 -> ~22.1 dB), validating the whole metric/noise plumbing."""
    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.metrics import calculate_metric
    from bsvd_tpu.utils import tensor2img

    ds = build_dataset({'name': 's', 'type': 'ValFolderDataset',
                        'valsetdir': synth_data, 'num_validation_frames': 8,
                        'valnoisestd': 20, 'manual_seed': 0})
    item = ds[0]
    lq, gt = item['lq'][0], item['gt'][0]
    psnrs = []
    for i in range(lq.shape[0]):
        psnrs.append(calculate_metric(
            {'img': tensor2img(np.clip(lq[i], 0, 1)), 'img2': tensor2img(gt[i])},
            {'type': 'calculate_psnr', 'crop_border': 0, 'test_y_channel': False}))
    mean_psnr = np.mean(psnrs)
    expected = 20 * np.log10(255 / (20 * 1.0))  # sigma=20/255 in [0,1] units
    # clipping at [0,1] raises PSNR slightly above the analytic value
    assert abs(mean_psnr - expected) < 1.5, (mean_psnr, expected)


def test_native_decoder_matches_cv2(synth_data):
    """C++ libpng/libjpeg decoder is bit-identical to cv2 (skips when the
    native library cannot build)."""
    import cv2
    from bsvd_tpu.data import native_decode as nd
    if not nd.available():
        pytest.skip('native decoder unavailable')
    import glob
    paths = sorted(glob.glob(os.path.join(synth_data, 'clip00', '*.png')))
    img = nd.decode_image(paths[0])
    ref = cv2.cvtColor(cv2.imread(paths[0]), cv2.COLOR_BGR2RGB)
    assert np.array_equal(img, ref)
    seq = nd.load_crop_seq(paths, y0=4, x0=8, crop_h=32, crop_w=24)
    assert seq.shape == (len(paths), 32, 24, 3)
    assert np.array_equal(seq[1],
                          cv2.cvtColor(cv2.imread(paths[1]),
                                       cv2.COLOR_BGR2RGB)[4:36, 8:32])


def test_native_roi_decode_matches_full(tmp_path):
    """Window (ROI) decode — only the crop's rows/columns pass through
    IDCT/defilter — is bit-identical to full-decode-then-crop for PNG and
    JPEG at iMCU-misaligned offsets (the training loader's hot path)."""
    import cv2
    from bsvd_tpu.data import native_decode as nd
    if not nd.available():
        pytest.skip('native decoder unavailable')
    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 255, (120, 200, 3))).astype(np.uint8)
    cases = []
    p_png = str(tmp_path / 'f.png')
    cv2.imwrite(p_png, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    cases.append(p_png)
    for q, sub in ((95, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420),
                   (90, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444)):
        p = str(tmp_path / f'f_{q}.jpg')
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, q,
                     cv2.IMWRITE_JPEG_SAMPLING_FACTOR, sub])
        cases.append(p)
    for path in cases:
        full = nd.decode_image(path)
        for y0, x0, ch, cw in ((0, 0, 120, 200), (13, 27, 41, 53),
                               (100, 150, 20, 50), (7, 0, 96, 96)):
            got = nd.load_crop_seq([path], y0, x0, ch, cw)
            assert got is not None, (path, y0, x0)
            np.testing.assert_array_equal(
                got[0], full[y0:y0 + ch, x0:x0 + cw],
                err_msg=f'{path} @ ({y0},{x0},{ch},{cw})')


def test_eval_center_frame_only_metric_scaling(synth_data, tmp_path):
    """center_frame_only scores one frame per clip; the reported average
    must be that frame's value, not value/num_frames (regression: the
    accumulator was sized to the full clip and mean'd over zero rows)."""
    from bsvd_tpu.test import test_pipeline
    opt_path = _opt_yaml(synth_data, tmp_path, center_frame_only=True)
    results = test_pipeline(str(tmp_path), opt_path=opt_path)
    res = results['synth_20']
    # a random-weight net scores low but in-band PSNR (> 3 dB); the old
    # bug divided by 8 frames, collapsing it to < 2 dB
    assert res['psnr'] > 3.0, res
    assert all(np.isfinite(v) for v in res.values())
