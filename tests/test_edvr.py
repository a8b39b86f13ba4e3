"""EDVR: forward shapes/finiteness, train step with TSA warm phase, and
sliding-window validation (the reference DCN is CUDA-only, so the deform-conv
itself is oracle-tested in test_deform_conv.py)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools'))


def _small_edvr(**kw):
    from bsvd_tpu.archs import build_network
    opt = dict(type='EDVR', num_in_ch=3, num_out_ch=3, num_feat=16,
               num_frame=3, deformable_groups=2, num_extract_block=1,
               num_reconstruct_block=1)
    opt.update(kw)
    return build_network(opt)


def test_edvr_forward():
    net = _small_edvr()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 3, 3, 16, 16)),
                    jnp.float32)
    y = net(x)
    assert y.shape == (1, 3, 64, 64)
    assert bool(jnp.isfinite(y).all())


def test_edvr_forward_no_tsa():
    net = _small_edvr(with_tsa=False)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 3, 3, 16, 16)),
                    jnp.float32)
    y = net(x)
    assert y.shape == (2, 3, 64, 64)


def test_edvr_model_train_and_validate(tmp_path):
    import cv2
    from make_synth_dataset import make_clip
    gt_root, lq_root = tmp_path / 'gt', tmp_path / 'lq'
    for c in range(1):
        os.makedirs(gt_root / f'{c:03d}')
        os.makedirs(lq_root / f'{c:03d}')
        for i, f in enumerate(make_clip(c, t=4, h=32, w=32)):
            cv2.imwrite(str(gt_root / f'{c:03d}' / f'{i:08d}.png'),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            lq = cv2.resize(f, (8, 8), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(lq_root / f'{c:03d}' / f'{i:08d}.png'),
                        cv2.cvtColor(lq, cv2.COLOR_RGB2BGR))

    from bsvd_tpu.data import build_dataloader, build_dataset
    from bsvd_tpu.models import build_model
    opt = {
        'name': 'edvr_smoke', 'model_type': 'EDVRModel', 'is_train': True,
        'num_gpu': 1, 'manual_seed': 0, 'scale': 4,
        'network_g': {'type': 'EDVR', 'num_in_ch': 3, 'num_out_ch': 3,
                      'num_feat': 8, 'num_frame': 3, 'deformable_groups': 2,
                      'num_extract_block': 1, 'num_reconstruct_block': 1},
        'path': {'models': str(tmp_path / 'm'),
                 'training_states': str(tmp_path / 's'),
                 'visualization': str(tmp_path / 'v')},
        'train': {'optim_g': {'type': 'Adam', 'lr': 4e-4, 'betas': [0.9, 0.99]},
                  'total_iter': 3, 'tsa_iter': 1, 'dcn_lr_mul': 0.25,
                  'pixel_opt': {'type': 'CharbonnierLoss'}},
        'val': {'metrics': {'psnr': {'type': 'calculate_psnr',
                                     'crop_border': 0}}},
        'logger': {},
    }
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])
    model = build_model(opt)

    rng = np.random.default_rng(0)
    lq = rng.uniform(0, 1, (1, 3, 3, 8, 8)).astype(np.float32)
    gt = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    pcd_before = np.asarray(jax.tree.leaves(model.params['pcd_align'])[0])
    for it in range(1, 4):
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(it)
        assert np.isfinite(model.log_dict['l_pix'])
    pcd_after = np.asarray(jax.tree.leaves(model.params['pcd_align'])[0])
    assert not np.array_equal(pcd_before, pcd_after)

    val_opt = {'name': 'edvr_val', 'type': 'VideoTestDataset',
               'dataroot_gt': str(gt_root), 'dataroot_lq': str(lq_root),
               'num_frame': 3, 'padding': 'reflection_circle'}
    val_set = build_dataset(val_opt)
    val_loader = build_dataloader(val_set, val_opt)
    res = model.nondist_validation(val_loader, 3, None, save_img=False)
    assert np.isfinite(res['psnr'])


def test_edvr_full_parity():
    """Full EDVR (PCD + TSA + DCN) vs the reference torch net (the stub
    provides a torch-native deform_conv2d with the same consumption layout)."""
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_util import load_reference
    torch = pytest.importorskip('torch')
    load_reference()
    from basicsr.archs.edvr_arch import EDVR as RefNet
    from bsvd_tpu.archs.edvr_arch import edvr_apply
    from bsvd_tpu.convert.torch_generic import state_dict_to_tree

    net = RefNet(num_in_ch=3, num_out_ch=3, num_feat=16, num_frame=5,
                 deformable_groups=4, num_extract_block=1,
                 num_reconstruct_block=1, with_tsa=True).eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = jax.tree.map(jnp.asarray, state_dict_to_tree(state))
    rng = np.random.default_rng(12)
    x = rng.uniform(0, 1, (1, 5, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = edvr_apply(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),
                     center_frame_idx=2, deformable_groups=4, with_tsa=True)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('hr_in', [False, True])
def test_edvr_predeblur_parity(hr_in):
    """EDVR with_predeblur (and hr_in) vs the reference PredeblurModule
    pipeline (reference edvr_arch.py:193-243, 294-296, 328-341, 378-381)."""
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_util import load_reference
    torch = pytest.importorskip('torch')
    load_reference()
    from basicsr.archs.edvr_arch import EDVR as RefNet
    from bsvd_tpu.archs.edvr_arch import edvr_apply
    from bsvd_tpu.convert.torch_generic import state_dict_to_tree

    net = RefNet(num_in_ch=3, num_out_ch=3, num_feat=16, num_frame=3,
                 deformable_groups=2, num_extract_block=1,
                 num_reconstruct_block=1, with_tsa=True,
                 with_predeblur=True, hr_in=hr_in).eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = jax.tree.map(jnp.asarray, state_dict_to_tree(state))
    rng = np.random.default_rng(13)
    size = 32 if hr_in else 16
    x = rng.uniform(0, 1, (1, 3, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = edvr_apply(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),
                     center_frame_idx=1, deformable_groups=2, with_tsa=True,
                     hr_in=hr_in)
    out_size = size if hr_in else size * 4
    assert ref.shape == (1, 3, out_size, out_size)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, rtol=2e-3, atol=2e-3)


def test_edvr_predeblur_random_init_forward():
    net = _small_edvr(with_predeblur=True)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 3, 3, 16, 16)),
                    jnp.float32)
    y = net(x)
    assert y.shape == (1, 3, 64, 64) and bool(jnp.isfinite(y).all())
    net_hr = _small_edvr(with_predeblur=True, hr_in=True)
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 3, 3, 32, 32)),
                    jnp.float32)
    y = net_hr(x)
    assert y.shape == (1, 3, 32, 32) and bool(jnp.isfinite(y).all())
