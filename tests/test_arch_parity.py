"""Numerical parity of the bsvd_tpu WNet/TSN against the reference torch
implementation on CPU with shared random weights (fp32).

Reference semantics covered:
- temporal shift op (train-mode shift, eval-mode batch_shift, causal variant)
  vs Experimental_root/archs/temporal_shift_ops/temporal_shift.py:27-80
- pixel shuffle vs torch.nn.PixelShuffle
- full TSN forward (bidirectional + causal + blind + 1-stage) vs tsm_arch.py
- chunked MIMO carry vs the reference global-queue batch_shift
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_apply, wnet_apply_chunk, wnet_init
from bsvd_tpu.convert.torch_ckpt import (convert_tsn_state_dict,
                                         params_to_tsn_state_dict)
from bsvd_tpu.nn.shift import temporal_shift, temporal_shift_chunk
from bsvd_tpu.nn.layers import pixel_shuffle

from reference_util import SMALL_NET2D_OPT, load_reference

torch = pytest.importorskip('torch')


def to_nthwc(x_nfchw):
    return jnp.asarray(np.transpose(x_nfchw, (0, 1, 3, 4, 2)))


def from_nthwc(y):
    return np.transpose(np.asarray(y), (0, 1, 4, 2, 3))


@pytest.mark.parametrize('shift_type', ['TSM', 'TSM_toFutureOnly'])
def test_shift_train_mode_parity(shift_type):
    ref = load_reference()
    rng = np.random.default_rng(0)
    n_batch, n_seg, c, h, w = 2, 5, 16, 8, 8
    x = rng.standard_normal((n_batch * n_seg, c, h, w)).astype(np.float32)

    ref_out = ref.temporal_shift.shift(torch.from_numpy(x), n_seg, shift_type,
                                       fold_div=8).numpy()

    x5 = x.reshape(n_batch, n_seg, c, h, w)
    mine = temporal_shift(to_nthwc(x5), fold_div=8, shift_type=shift_type)
    np.testing.assert_allclose(from_nthwc(mine).reshape(ref_out.shape), ref_out,
                               rtol=0, atol=0)


@pytest.mark.parametrize('shift_type', ['TSM', 'TSM_toFutureOnly'])
def test_shift_chunked_parity_vs_global_queue(shift_type):
    """Chunked carry == reference batch_shift + global queue across 3 chunks."""
    ref = load_reference()
    gq = ref.global_queue_buffer
    rng = np.random.default_rng(1)
    c, h, w = 16, 6, 6
    t_chunk, future = 4, 2
    chunks = [rng.standard_normal((t_chunk + future, c, h, w)).astype(np.float32)
              for _ in range(3)]

    gq._init(future)
    ref_outs = []
    for i, ch in enumerate(chunks):
        gq.set_batch_index(i)
        ref_outs.append(ref.temporal_shift.batch_shift(
            torch.from_numpy(ch), shift_type, fold_div=8).numpy())

    carry = None
    for i, ch in enumerate(chunks):
        x = to_nthwc(ch[None])
        mine, carry = temporal_shift_chunk(x, carry, fold_div=8,
                                           shift_type=shift_type,
                                           future_buffer_len=future)
        np.testing.assert_allclose(from_nthwc(mine)[0], ref_outs[i],
                                   rtol=0, atol=0, err_msg=f'chunk {i}')


def test_pixel_shuffle_parity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 12, 5, 7)).astype(np.float32)
    ref_out = torch.nn.PixelShuffle(2)(torch.from_numpy(x)).numpy()
    mine = pixel_shuffle(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 2)
    np.testing.assert_allclose(np.transpose(np.asarray(mine), (0, 3, 1, 2)),
                               ref_out, rtol=0, atol=0)


def _make_ref_tsn(ref, net2d_opt, shift_type='TSM', num_segments=5):
    tsn = ref.tsm_arch.TSN(num_segments=num_segments,
                           base_model='WNet_multistage',
                           shift_type=shift_type, shift_div=8,
                           net2d_opt=net2d_opt)
    tsn.train()  # train mode => per-segment shift(), no global queue
    return tsn


def _cfg_from_opt(net2d_opt, shift_mode='TSM'):
    return WNetConfig(
        chns=tuple(net2d_opt['chns']), mid_ch=net2d_opt['mid_ch'],
        in_ch=net2d_opt.get('in_ch', 4), out_ch=net2d_opt.get('out_ch', 3),
        stage_num=net2d_opt.get('stage_num', 2),
        interm_ch=net2d_opt['interm_ch'], norm=net2d_opt['norm'],
        act=net2d_opt['act'], blind=net2d_opt.get('blind', False),
        shift_input=net2d_opt.get('shift_input', False), shift_mode=shift_mode)


@pytest.mark.parametrize('variant', ['bidir', 'causal', 'blind', 'stage1', 'shift_input'])
def test_tsn_forward_parity(variant):
    ref = load_reference()
    opt = dict(SMALL_NET2D_OPT)
    shift_type = 'TSM'
    if variant == 'causal':
        shift_type = 'TSM_toFutureOnly'
    elif variant == 'blind':
        opt['blind'] = True
    elif variant == 'stage1':
        opt['stage_num'] = 1
    elif variant == 'shift_input':
        opt['shift_input'] = True

    num_seg, n, h, w = 5, 2, 16, 16
    tsn = _make_ref_tsn(ref, opt, shift_type, num_seg)
    cfg = _cfg_from_opt(opt, shift_mode=shift_type)

    state = {k: v.detach().numpy() for k, v in tsn.state_dict().items()}
    # reference state dict from TSN itself has no 'base_model.' stripped
    params = convert_tsn_state_dict(state, cfg)
    params = jax.tree.map(jnp.asarray, params)

    cin = 3 if opt.get('blind') else 4
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n, num_seg, cin, h, w)).astype(np.float32)

    with torch.no_grad():
        ref_out = tsn(torch.from_numpy(x)).numpy()

    mine = wnet_apply(params, to_nthwc(x), cfg)
    np.testing.assert_allclose(from_nthwc(mine), ref_out, rtol=1e-4, atol=1e-4)


def test_tsn_chunked_eval_parity():
    """Eval-mode TSN (batch_shift + global queue over chunks) == my chunked
    MIMO with explicit carries — the reference's training-time validation
    algorithm (validation_seq_infer.py:33-89)."""
    ref = load_reference()
    opt = dict(SMALL_NET2D_OPT)
    tsn = _make_ref_tsn(ref, opt, 'TSM', num_segments=4)
    cfg = _cfg_from_opt(opt)
    state = {k: v.detach().numpy() for k, v in tsn.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_tsn_state_dict(state, cfg))

    rng = np.random.default_rng(4)
    t_chunk, future, h, w = 4, 2, 16, 16
    chunks = [rng.standard_normal((1, t_chunk + future, 4, h, w)).astype(np.float32)
              for _ in range(3)]

    tsn.eval()
    gq = ref.global_queue_buffer
    gq._init(future)
    ref_outs = []
    with torch.no_grad():
        for i, ch in enumerate(chunks):
            gq.set_batch_index(i)
            ref_outs.append(tsn(torch.from_numpy(ch)).numpy())

    carries = None
    for i, ch in enumerate(chunks):
        mine, carries = wnet_apply_chunk(params, to_nthwc(ch), cfg, carries,
                                         future_buffer_len=future)
        np.testing.assert_allclose(from_nthwc(mine), ref_outs[i],
                                   rtol=1e-4, atol=1e-4, err_msg=f'chunk {i}')


def test_roundtrip_state_dict():
    """params -> torch TSN state dict -> params is the identity."""
    cfg = WNetConfig(chns=(16, 32, 64), mid_ch=16, interm_ch=16,
                     norm='none', act='relu6')
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    state = params_to_tsn_state_dict(params, cfg)
    back = convert_tsn_state_dict(state, cfg)
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(jax.tree.map(jnp.asarray, back))
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ref_checkpoint_file_conversion(tmp_path):
    """A torch-saved {'params': sd} checkpoint loads and reproduces the
    reference forward (the real bsvd-64.pth pipeline, bsvd_arch.py:462-474)."""
    ref = load_reference()
    opt = dict(SMALL_NET2D_OPT)
    tsn = _make_ref_tsn(ref, opt, 'TSM', num_segments=4)
    path = tmp_path / 'net_g.pth'
    torch.save({'params': tsn.state_dict()}, path)

    from bsvd_tpu.convert.torch_ckpt import load_params
    cfg = _cfg_from_opt(opt)
    params = load_params(path, cfg)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 4, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = tsn(torch.from_numpy(x)).numpy()
    mine = wnet_apply(params, to_nthwc(x), cfg)
    np.testing.assert_allclose(from_nthwc(mine), ref_out, rtol=1e-4, atol=1e-4)
