"""Video SR parity vs reference torch: flow_warp/grid_sample, SpyNet,
BasicVSR (random weights, CPU fp32)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_util import load_reference

torch = pytest.importorskip('torch')


def _convert(module):
    from bsvd_tpu.convert.torch_generic import state_dict_to_tree
    state = {k: v.detach().numpy() for k, v in module.state_dict().items()
             if 'mean' not in k and 'std' not in k}
    return jax.tree.map(jnp.asarray, state_dict_to_tree(state))


@pytest.mark.parametrize('padding_mode', ['zeros', 'border'])
def test_flow_warp_parity(padding_mode):
    load_reference()
    from basicsr.archs.arch_util import flow_warp as ref_flow_warp
    from bsvd_tpu.nn.warp import flow_warp
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 10, 12)).astype(np.float32)   # NCHW
    flow = (rng.standard_normal((2, 10, 12, 2)) * 3).astype(np.float32)
    ref = ref_flow_warp(torch.from_numpy(x), torch.from_numpy(flow),
                        padding_mode=padding_mode).numpy()
    got = flow_warp(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    jnp.asarray(flow), padding_mode=padding_mode)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-5)


def test_interpolate_parity():
    from bsvd_tpu.nn.warp import interpolate_bilinear
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 7, 9)).astype(np.float32)
    for ac, (oh, ow) in [(True, (8, 14)), (False, (8, 18)), (False, (3, 5))]:
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(oh, ow), mode='bilinear',
            align_corners=ac).numpy()
        got = interpolate_bilinear(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                                   oh, ow, align_corners=ac)
        np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                                   ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f'ac={ac} {oh}x{ow}')


def test_spynet_parity():
    load_reference()
    from basicsr.archs.spynet_arch import SpyNet as RefSpyNet
    from bsvd_tpu.archs.spynet_arch import spynet_apply
    net = RefSpyNet(load_path=None).eval()
    params = _convert(net)
    rng = np.random.default_rng(2)
    ref_img = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    supp_img = np.clip(ref_img + rng.normal(0, 0.05, ref_img.shape), 0, 1).astype(np.float32)
    with torch.no_grad():
        ref_flow = net(torch.from_numpy(ref_img), torch.from_numpy(supp_img)).numpy()
    got = jax.jit(spynet_apply)(
        params, jnp.asarray(np.transpose(ref_img, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(supp_img, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref_flow, rtol=1e-3, atol=1e-4)


def test_basicvsr_parity():
    load_reference()
    from basicsr.archs.basicvsr_arch import BasicVSR as RefNet
    from bsvd_tpu.archs.basicvsr_arch import basicvsr_apply
    net = RefNet(num_feat=16, num_block=2, spynet_path=None).eval()
    params = _convert(net)
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 5, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    fn = jax.jit(functools.partial(basicvsr_apply, num_feat=16))
    got = fn(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 1, 4, 2, 3)),
                               ref, rtol=1e-3, atol=1e-3)


def test_duf_parity():
    load_reference()
    from basicsr.archs.duf_arch import DUF as RefNet
    from bsvd_tpu.archs.duf_arch import convert_duf_state, duf_apply
    net = RefNet(scale=4, num_layer=16).eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_duf_state(state))
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1, (1, 7, 3, 12, 14)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = duf_apply(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),
                    scale=4)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, rtol=2e-3, atol=2e-4)


def test_toflow_parity():
    load_reference()
    from basicsr.archs.tof_arch import TOFlow as RefNet
    from bsvd_tpu.archs.tof_arch import toflow_apply
    from bsvd_tpu.archs.duf_arch import convert_duf_state
    net = RefNet().eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()
             if k not in ('mean', 'std')}
    tree = convert_duf_state(state)

    def fix(node):
        if isinstance(node, dict):
            if 'w' in node and getattr(node['w'], 'ndim', 0) == 4:
                node = dict(node, w=np.transpose(node['w'], (2, 3, 1, 0)))
            return {k: fix(v) if isinstance(v, dict) else v
                    for k, v in node.items()}
        return node
    params = jax.tree.map(jnp.asarray, fix(tree))
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, (1, 7, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = jax.jit(toflow_apply)(params,
                                jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, rtol=2e-3, atol=2e-3)


def test_iconvsr_parity():
    load_reference()
    from basicsr.archs.basicvsr_arch import IconVSR as RefNet
    from bsvd_tpu.archs.basicvsr_arch import iconvsr_apply
    # the reference extractor hardcodes 64 feature channels, so num_feat=64
    net = RefNet(num_feat=64, num_block=1, keyframe_stride=3,
                 temporal_padding=2, spynet_path=None, edvr_path=None).eval()
    params = _convert(net)
    rng = np.random.default_rng(8)
    x = rng.uniform(0, 1, (1, 5, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    # jit: one compiled program instead of ~700 eager op dispatches (2x
    # faster cold, ~10x with a warm persistent compile cache)
    fn = jax.jit(functools.partial(iconvsr_apply, num_feat=64,
                                   keyframe_stride=3, temporal_padding=2))
    got = fn(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 1, 4, 2, 3)),
                               ref, rtol=2e-3, atol=2e-3)
