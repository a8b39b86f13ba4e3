"""SR model-zoo parity vs the reference torch archs (random weights, CPU
fp32): MSRResNet, EDSR, RRDBNet (reference: BasicSR/basicsr/archs/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_util import load_reference

torch = pytest.importorskip('torch')


def _convert(tsn_module):
    from bsvd_tpu.convert.torch_generic import state_dict_to_tree
    state = {k: v.detach().numpy() for k, v in tsn_module.state_dict().items()}
    return jax.tree.map(jnp.asarray, state_dict_to_tree(state))


def _nchw(x):
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))


def _to_np(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize('upscale', [2, 4])
def test_msrresnet_parity(upscale):
    load_reference()
    from basicsr.archs.srresnet_arch import MSRResNet as RefNet
    from bsvd_tpu.archs.sr_archs import msrresnet_apply
    net = RefNet(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2,
                 upscale=upscale).eval()
    params = _convert(net)
    x = np.random.default_rng(0).standard_normal((1, 3, 16, 20)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = _to_np(msrresnet_apply(params, _nchw(x), upscale=upscale))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_edsr_parity():
    load_reference()
    from basicsr.archs.edsr_arch import EDSR as RefNet
    from bsvd_tpu.archs.sr_archs import edsr_apply
    net = RefNet(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2,
                 upscale=2, res_scale=0.5).eval()
    params = _convert(net)
    # drop the non-param 'mean' buffer if present
    params.pop('mean', None)
    x = np.random.default_rng(1).uniform(0, 1, (1, 3, 12, 14)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = _to_np(edsr_apply(params, _nchw(x), upscale=2, res_scale=0.5))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('scale', [1, 2, 4])
def test_rrdbnet_parity(scale):
    load_reference()
    from basicsr.archs.rrdbnet_arch import RRDBNet as RefNet
    from bsvd_tpu.archs.sr_archs import rrdbnet_apply
    net = RefNet(num_in_ch=3, num_out_ch=3, scale=scale, num_feat=16,
                 num_block=2, num_grow_ch=8).eval()
    params = _convert(net)
    x = np.random.default_rng(2).uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = _to_np(rrdbnet_apply(params, _nchw(x), scale=scale))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_matlab_imresize_parity():
    load_reference()
    from basicsr.utils.matlab_functions import imresize as ref_imresize
    from bsvd_tpu.utils.matlab_functions import imresize
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (17, 23, 3)).astype(np.float32)
    for scale in (0.25, 0.5, 2.0):
        ref = ref_imresize(torch.from_numpy(img.transpose(2, 0, 1)), scale)
        ref = ref.numpy().transpose(1, 2, 0)
        got = imresize(img, scale)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f'scale {scale}')


def test_registered_wrappers():
    from bsvd_tpu.archs import build_network
    net = build_network({'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
                         'num_feat': 8, 'num_block': 1, 'upscale': 2})
    y = net(jnp.zeros((1, 3, 8, 8)))
    assert y.shape == (1, 3, 16, 16)


def test_rcan_parity():
    load_reference()
    from basicsr.archs.rcan_arch import RCAN as RefNet
    from bsvd_tpu.archs.sr_archs import rcan_apply
    net = RefNet(num_in_ch=3, num_out_ch=3, num_feat=16, num_group=2,
                 num_block=2, squeeze_factor=4, upscale=2).eval()
    params = _convert(net)
    params.pop('mean', None)
    x = np.random.default_rng(5).uniform(0, 1, (1, 3, 12, 14)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = _to_np(rcan_apply(params, _nchw(x), upscale=2))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('upsampler', ['pixelshuffledirect', ''])
def test_swinir_parity(upsampler):
    load_reference()
    from basicsr.archs.swinir_arch import SwinIR as RefNet
    from bsvd_tpu.archs.swinir_arch import swinir_apply
    upscale = 2 if upsampler else 1
    net = RefNet(img_size=16, patch_size=1, in_chans=3, embed_dim=12,
                 depths=(2, 2), num_heads=(2, 2), window_size=4,
                 mlp_ratio=2., upscale=upscale, img_range=1.,
                 upsampler=upsampler, resi_connection='1conv').eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()
             if 'relative_position_index' not in k and 'attn_mask' not in k
             and k != 'mean'}
    from bsvd_tpu.convert.torch_generic import state_dict_to_tree
    params = jax.tree.map(jnp.asarray, state_dict_to_tree(state))
    x = np.random.default_rng(8).uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = swinir_apply(params, _nchw(x), in_chans=3, window_size=4,
                       num_heads=(2, 2), mlp_ratio=2., upscale=upscale,
                       img_range=1., upsampler=upsampler,
                       resi_connection='1conv')
    np.testing.assert_allclose(_to_np(got), ref, rtol=2e-3, atol=2e-4)


def test_ridnet_parity():
    load_reference()
    from basicsr.archs.ridnet_arch import RIDNet as RefNet
    from bsvd_tpu.archs.sr_archs import ridnet_apply
    net = RefNet(in_channels=3, mid_channels=16, out_channels=3,
                 num_block=2).eval()
    params = _convert(net)
    x = np.random.default_rng(9).uniform(0, 1, (1, 3, 20, 24)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = _to_np(ridnet_apply(params, _nchw(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
