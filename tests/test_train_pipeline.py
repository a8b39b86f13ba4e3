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
    # max_number_patches counts PATCHES: 5 patches / (2x2 global batch)
    # -> ceil = 2 iterations per epoch (reference DALI size= semantics)
    assert len(batches) == 2
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


def test_amp_training_bf16(train_data, tmp_path):
    """`train.fp16` runs forward/backward in bf16 with fp32 master params —
    the TPU equivalent of the reference's autocast-wrapped train step
    (train_pipeline.py:175). The bf16 loss must track fp32 closely and the
    loss must still decrease."""
    import copy

    import jax
    import jax.numpy as jnp

    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.models import build_model
    from bsvd_tpu.utils.options import parse_options
    opt_path = _train_opt(train_data, tmp_path)
    opt, _ = parse_options(str(tmp_path), is_train=True, opt_path=opt_path)
    os.makedirs(opt['path']['models'], exist_ok=True)
    os.makedirs(opt['path']['training_states'], exist_ok=True)
    loader = build_dataset({**opt['datasets']['train'], 'num_devices': 2,
                            'manual_seed': 0})
    batch = next(iter(loader))
    loader.close()

    losses = {}
    for amp in (False, True):
        o = copy.deepcopy(opt)
        o['train']['fp16'] = amp
        o['num_gpu'] = 1          # plain (non-shard_map) step: cheap compile
        model = build_model(o)
        ls = []
        for it in range(1, 4):
            model.feed_data(batch)
            model.optimize_parameters(it)
            ls.append(float(model.log_dict['l_pix']))
        losses[amp] = ls
        assert all(leaf.dtype == jnp.float32
                   for leaf in jax.tree.leaves(model.params)), \
            'master params must stay fp32 under AMP'
    assert losses[True][-1] < losses[True][0], losses[True]
    np.testing.assert_allclose(losses[True][0], losses[False][0], rtol=0.05)


def test_remat_grads_match():
    """Stage-level rematerialization (net2d_opt.remat — jax.checkpoint per
    stage) must not change gradients, only the memory/FLOPs trade."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_apply, wnet_init
    cfg = WNetConfig(chns=(8, 16, 32), mid_ch=8, interm_ch=8, norm='none',
                     act='relu6', shift_mode='TSM')
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (1, 4, 16, 16, cfg.effective_in_ch))

    def loss(p, c):
        return jnp.mean(wnet_apply(p, x, c) ** 2)

    g0 = jax.grad(loss)(params, cfg)
    g1 = jax.grad(loss)(params, dataclasses.replace(cfg, remat=True))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_bn_training_updates_running_stats(train_data, tmp_path):
    """norm='bn' trains with batch stats and folds running-stat updates
    (torch BN train semantics); eval uses the running stats."""
    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.models import build_model
    from bsvd_tpu.utils.options import parse_options
    opt_path = _train_opt(train_data, tmp_path)
    opt, _ = parse_options(str(tmp_path), is_train=True, opt_path=opt_path)
    opt['network_g']['net2d_opt']['norm'] = 'bn'
    os.makedirs(opt['path']['models'], exist_ok=True)
    os.makedirs(opt['path']['training_states'], exist_ok=True)
    model = build_model(opt)
    loader = build_dataset({**opt['datasets']['train'], 'num_devices': 2,
                            'manual_seed': 0})
    batch = next(iter(loader))
    loader.close()
    mean_before = np.array(model.params['stage0']['inc']['n1']['mean'])
    var_before = np.array(model.params['stage0']['inc']['n1']['var'])
    for it in range(1, 3):
        model.feed_data(batch)
        model.optimize_parameters(it)
        assert np.isfinite(model.log_dict['l_pix'])
    mean_after = np.asarray(model.params['stage0']['inc']['n1']['mean'])
    var_after = np.asarray(model.params['stage0']['inc']['n1']['var'])
    assert not np.allclose(mean_after, mean_before)
    assert not np.allclose(var_after, var_before)


def test_bn_eval_parity_vs_torch(train_data, tmp_path):
    """Converted BN checkpoints reproduce torch eval-mode outputs."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from reference_util import SMALL_NET2D_OPT, load_reference
    torch = pytest.importorskip('torch')
    ref = load_reference()
    import jax, jax.numpy as jnp
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_apply
    from bsvd_tpu.convert.torch_ckpt import convert_tsn_state_dict

    opt = dict(SMALL_NET2D_OPT, norm='bn', act='relu')
    tsn = ref.tsm_arch.TSN(num_segments=4, base_model='WNet_multistage',
                           shift_type='TSM', shift_div=8, net2d_opt=opt)
    # randomize running stats so eval parity is meaningful
    with torch.no_grad():
        for m in tsn.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    tsn.train()  # train-mode SHIFT path, but we compare with eval-mode BN:
    tsn.eval()
    cfg = WNetConfig(chns=tuple(opt['chns']), mid_ch=opt['mid_ch'], in_ch=4,
                     out_ch=3, stage_num=2, interm_ch=opt['interm_ch'],
                     norm='bn', act='relu', shift_mode='TSM')
    state = {k: v.detach().numpy() for k, v in tsn.state_dict().items()
             if 'num_batches_tracked' not in k}
    params = jax.tree.map(jnp.asarray, convert_tsn_state_dict(state, cfg))
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 4, 4, 16, 16)).astype(np.float32)
    # eval mode in reference uses batch_shift with queue; force train-shift by
    # comparing against manual eval: run reference modules in train shift but
    # BN eval via torch's eval... simplest: reference eval-mode with the
    # global queue initialized for one chunk equals whole-segment shift
    gq = ref.global_queue_buffer
    gq._init(0)
    gq.set_batch_index(0)
    with torch.no_grad():
        ref_out = tsn(torch.from_numpy(x.reshape(4, 4, 16, 16))).numpy()
    mine = wnet_apply(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))), cfg)
    got = np.transpose(np.asarray(mine), (0, 1, 4, 2, 3)).reshape(ref_out.shape)
    np.testing.assert_allclose(got, ref_out, rtol=1e-3, atol=1e-4)


def test_auto_resume(train_data, tmp_path):
    """Training resumes from the latest .state: iter counter, optimizer
    state, and params all restored (reference train_pipeline.py:72-92)."""
    from bsvd_tpu.train import train_pipeline
    from bsvd_tpu.models import latest_resume_state
    from bsvd_tpu.models.checkpoint import load_training_state
    import jax

    opt_path = _train_opt(train_data, tmp_path, total_iter=4)
    old_cwd = os.getcwd()
    os.chdir(tmp_path)   # auto-resume scans experiments/<name> relative to cwd
    try:
        model1 = train_pipeline(str(tmp_path), opt_path=opt_path)
        state_dir = str(tmp_path / 'experiments' / 'smoke_train' /
                        'training_states')
        latest = latest_resume_state(state_dir)
        assert latest and latest.endswith('4.state')
        st = load_training_state(latest)
        assert st['iter'] == 4

        # simulate a restart with a higher total_iter and auto_resume
        opt_path2 = _train_opt(train_data, tmp_path, total_iter=6)
        import yaml as _yaml
        opt = _yaml.safe_load(open(opt_path2))
        opt['name'] = 'smoke_train'
        open(opt_path2, 'w').write(_yaml.safe_dump(opt))
        from bsvd_tpu.utils.options import parse_options
        o2, _ = parse_options(str(tmp_path), is_train=True, opt_path=opt_path2)
        o2['auto_resume'] = True
        from bsvd_tpu.train import load_resume_state
        rs = load_resume_state(o2)
        assert rs is not None and rs['iter'] == 4
        assert o2['path']['pretrain_network_g'].endswith('net_g_4.npz')
    finally:
        os.chdir(old_cwd)


def test_perceptual_loss_changes_training(train_data, tmp_path):
    """A perceptual_opt config must contribute to the gradients, not be
    silently dropped (reference denoising_model.py:115-122)."""
    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.models import build_model
    from bsvd_tpu.utils.options import parse_options
    import jax

    opt_path = _train_opt(train_data, tmp_path)
    opt, _ = parse_options(str(tmp_path), is_train=True, opt_path=opt_path)
    os.makedirs(opt['path']['models'], exist_ok=True)
    os.makedirs(opt['path']['training_states'], exist_ok=True)
    loader = build_dataset({**opt['datasets']['train'], 'num_devices': 2,
                            'manual_seed': 0})
    batch = next(iter(loader))
    loader.close()

    import copy
    opt_p = copy.deepcopy(opt)
    opt_p['train']['perceptual_opt'] = {
        'type': 'PerceptualLoss', 'layer_weights': {'relu1_2': 1.0},
        'vgg_type': 'vgg19', 'perceptual_weight': 1.0, 'style_weight': 0.5,
        'criterion': 'l1'}

    model_pix = build_model(copy.deepcopy(opt))
    model_per = build_model(opt_p)
    # identical init so any divergence comes from the perceptual term
    import jax.numpy as jnp
    # fresh buffers: the jitted step donates its inputs, so the two models
    # must not alias arrays
    model_per.params = jax.tree.map(jnp.array, model_pix.params)
    model_per.opt_state = model_per.tx.init(model_per.params)

    model_pix.feed_data(batch)
    model_pix.optimize_parameters(1)
    model_per.feed_data(batch)
    model_per.optimize_parameters(1)

    assert 'l_percep' in model_per.log_dict and 'l_style' in model_per.log_dict
    assert np.isfinite(model_per.log_dict['l_percep'])
    assert np.isfinite(model_per.log_dict['l_style'])
    assert 'l_percep' not in model_pix.log_dict
    a = jax.tree.leaves(model_pix.params)
    b = jax.tree.leaves(model_per.params)
    assert any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b)), 'perceptual term did not change grads'


def test_validation_logs_once_after_all_folders(train_data, tmp_path, monkeypatch):
    """Aggregation must run once after the folder loop — logging inside the
    loop averaged all-zero rows for unevaluated folders (reference
    denoising_model.py:318-367 logs once)."""
    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.models import build_model
    from bsvd_tpu.utils.options import parse_options

    opt_path = _train_opt(train_data, tmp_path, total_iter=2)
    opt, _ = parse_options(str(tmp_path), is_train=True, opt_path=opt_path)
    os.makedirs(opt['path']['models'], exist_ok=True)
    os.makedirs(opt['path']['training_states'], exist_ok=True)
    model = build_model(opt)
    val_ds = build_dataset(opt['datasets']['val'])
    assert len(val_ds) >= 2, 'need >=2 folders for this test'

    class _Loader:
        dataset = val_ds
    calls = []
    orig = model._log_validation_metric_values

    def spy(current_iter, dataset_name, tb_logger):
        res = orig(current_iter, dataset_name, tb_logger)
        calls.append(res)
        return res
    monkeypatch.setattr(model, '_log_validation_metric_values', spy)
    result = model.nondist_validation(_Loader(), 1, None, save_img=False)
    assert len(calls) == 1, 'validation must aggregate exactly once'
    # every folder contributed a non-zero PSNR (no zero rows averaged in)
    for folder, arr in model.metric_results.items():
        assert arr.mean() > 0, f'folder {folder} has zero metrics'
    assert result['psnr'] > 0


def test_trained_net_denoises(train_data, tmp_path):
    """Accuracy anchor (not just loss-goes-down): ~200 tiny-train steps on
    synth data must produce a real denoiser — catches silent math breakage
    that leaves the loss decreasing but the output useless.

    Calibration (measured): the random init scores ~5.4 dB on the sigma-20
    clip; 200 steps reach ~18.9 dB and keep climbing (the +22.3 dB noisy
    baseline needs thousands of steps — out of CI budget). The bar is a
    >=11 dB gain over init AND >=17 dB absolute; broken shift/conv/ckpt
    math stalls near init or diverges, far below either."""
    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.models import build_model
    from bsvd_tpu.utils.options import parse_options
    opt_path = _train_opt(train_data, tmp_path, total_iter=200)
    opt, _ = parse_options(str(tmp_path), is_train=True, opt_path=opt_path)
    opt['train']['ema_decay'] = 0           # score the raw trained params
    os.makedirs(opt['path']['models'], exist_ok=True)
    os.makedirs(opt['path']['training_states'], exist_ok=True)
    model = build_model(opt)

    val = build_dataset(opt['datasets']['val'])
    item = val[0]

    def psnr(a, b):
        return -10.0 * np.log10(np.mean((a - b) ** 2))

    def eval_psnr():
        model.feed_data({k: item[k] for k in ('lq', 'gt', 'noise_map')})
        model.test()
        return psnr(np.clip(np.asarray(model.output), 0., 1.),
                    np.asarray(item['gt']))

    init_psnr = eval_psnr()
    loader = build_dataset({**opt['datasets']['train'], 'num_devices': 2,
                            'manual_seed': 0})
    it = 0
    while it < 200:          # epochs are now 25 iters (100 patches / 4)
        for batch in loader:
            it += 1
            model.feed_data(batch)
            model.optimize_parameters(it)
            if it >= 200:
                break
    loader.close()

    denoised_psnr = eval_psnr()
    assert denoised_psnr > init_psnr + 11.0, (init_psnr, denoised_psnr)
    assert denoised_psnr > 17.0, (init_psnr, denoised_psnr)


def test_bn_train_mode_parity_vs_torch(tmp_path):
    """Train-mode BatchNorm parity over several optimizer steps: batch-stat
    normalization in the forward/backward, momentum running-stat updates
    (unbiased var), and the post-training eval forward all match torch BN
    (reference default norm: wnet_models.py CvBlock 'bn'). SGD keeps the
    optimizer exactly comparable. Golden-fixture-backed (tests/golden_util)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from golden_util import golden
    from reference_util import SMALL_NET2D_OPT, load_reference
    torch = pytest.importorskip('torch')
    import jax, jax.numpy as jnp
    import optax
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_apply, wnet_init
    from bsvd_tpu.convert.torch_ckpt import (convert_tsn_state_dict,
                                             params_to_tsn_state_dict)
    from bsvd_tpu.losses import MSELoss
    from bsvd_tpu.models.denoising_model import make_train_step

    opt = dict(SMALL_NET2D_OPT, norm='bn', act='relu')
    cfg = WNetConfig(chns=tuple(opt['chns']), mid_ch=opt['mid_ch'], in_ch=4,
                     out_ch=3, stage_num=2, interm_ch=opt['interm_ch'],
                     norm='bn', act='relu', shift_mode='TSM')
    params0 = wnet_init(jax.random.PRNGKey(21), cfg)
    state0 = params_to_tsn_state_dict(params0, cfg)

    n, t, h, w = 2, 4, 16, 16
    # lr small enough that fp32 summation-order noise (~5e-7/step) never
    # crosses a ReLU/BN-rsqrt decision boundary: at lr=0.05 the frameworks'
    # bitwise-different-but-equivalent updates amplify chaotically (x2000
    # per step, measured); at 0.005 the 3-step drift stays at fp noise.
    lr, steps = 0.005, 3
    rng = np.random.default_rng(22)
    lqs = rng.standard_normal((steps, n, t, 4, h, w)).astype(np.float32)
    gts = rng.standard_normal((steps, n, t, 3, h, w)).astype(np.float32)
    x_eval = rng.standard_normal((1, t, 4, h, w)).astype(np.float32)

    def generate():
        ref = load_reference()
        tsn = ref.tsm_arch.TSN(num_segments=t, base_model='WNet_multistage',
                               shift_type='TSM', shift_div=8, net2d_opt=opt)
        tsn.load_state_dict({k: torch.from_numpy(np.asarray(v))
                             for k, v in state0.items()}, strict=False)
        tsn.train()
        # hand-rolled SGD (torch.optim pulls in torch._dynamo, which fails
        # to import in this environment); identical math to optax.sgd(lr)
        for i in range(steps):
            tsn.zero_grad()
            out = tsn(torch.from_numpy(lqs[i]))
            loss = torch.mean((out - torch.from_numpy(gts[i])) ** 2)
            loss.backward()
            with torch.no_grad():
                for p in tsn.parameters():
                    if p.grad is not None:
                        p -= lr * p.grad
        bn = tsn.base_model.nets_list[0].inc.convblock[1]
        assert isinstance(bn, torch.nn.BatchNorm2d)
        tsn.eval()
        gq = ref.global_queue_buffer
        gq._init(0)
        gq.set_batch_index(0)
        with torch.no_grad():
            ref_eval = tsn(torch.from_numpy(x_eval)).numpy()
        return {'ref_mean': bn.running_mean.detach().numpy(),
                'ref_var': bn.running_var.detach().numpy(),
                'ref_eval': ref_eval}

    g = golden('bn_train_parity', generate)

    params = jax.tree.map(jnp.asarray, convert_tsn_state_dict(state0, cfg))
    tx = optax.sgd(lr)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, MSELoss(), params_template=params)
    jstep = jax.jit(step)
    to_nthwc = lambda v: jnp.asarray(np.transpose(v, (0, 1, 3, 4, 2)))  # noqa: E731
    for i in range(steps):
        batch = {'lq': to_nthwc(lqs[i]), 'gt': to_nthwc(gts[i])}
        params, opt_state, _, loss_dict = jstep(params, opt_state, None,
                                                batch, i, 0.999)
        assert np.isfinite(float(loss_dict['l_pix']))

    got_bn = params['stage0']['inc']['n1']
    np.testing.assert_allclose(np.asarray(got_bn['mean']), g['ref_mean'],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_bn['var']), g['ref_var'],
                               rtol=1e-5, atol=1e-5)
    mine = wnet_apply(params, to_nthwc(x_eval), cfg)
    got = np.transpose(np.asarray(mine), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(got, g['ref_eval'], rtol=1e-4, atol=1e-4)


def test_resume_training_trajectory_equivalence(train_data, tmp_path):
    """Full resume restores params + EMA (via check_resume's pretrain
    repoint) AND the optimizer state (BaseModel.resume_training): training
    4 steps, restarting, then training 2 more must land bit-close to 6
    straight steps — a dropped Adam moment diverges immediately
    (reference train_pipeline.py:72-92 + base_model.py:315-328)."""
    import copy
    import jax
    import jax.numpy as jnp
    from bsvd_tpu.models import build_model
    from bsvd_tpu.models.checkpoint import load_training_state
    from bsvd_tpu.utils.misc import check_resume
    from bsvd_tpu.utils.options import parse_options

    opt_path = _train_opt(train_data, tmp_path)
    opt, _ = parse_options(str(tmp_path), is_train=True, opt_path=opt_path)
    os.makedirs(opt['path']['models'], exist_ok=True)
    os.makedirs(opt['path']['training_states'], exist_ok=True)

    rng = np.random.default_rng(42)
    batches = []
    for _ in range(6):
        gt = rng.uniform(0, 1, (2, 5, 3, 32, 32)).astype(np.float32)
        nm = np.full((2, 5, 1, 32, 32), 25 / 255., np.float32)
        batches.append({'gt': gt,
                        'lq': (gt + rng.normal(0, 25 / 255., gt.shape)
                               ).astype(np.float32),
                        'noise_map': nm})

    # branch A: 6 straight steps
    model_a = build_model(copy.deepcopy(opt))
    for i, b in enumerate(batches, 1):
        model_a.feed_data(b)
        model_a.optimize_parameters(i)

    # branch B: 4 steps, save, then resume into a fresh model for 5..6
    model_b = build_model(copy.deepcopy(opt))
    for i, b in enumerate(batches[:4], 1):
        model_b.feed_data(b)
        model_b.optimize_parameters(i)
    model_b.save(epoch=0, current_iter=4)

    state_path = os.path.join(opt['path']['training_states'], '4.state')
    assert os.path.isfile(state_path)
    resume_state = load_training_state(state_path)
    assert resume_state['iter'] == 4

    opt_c = copy.deepcopy(opt)
    opt_c['path']['resume_state'] = state_path
    check_resume(opt_c, resume_state['iter'])
    assert opt_c['path']['pretrain_network_g'].endswith('net_g_4.npz')
    model_c = build_model(opt_c)
    model_c.resume_training(resume_state)
    for i, b in enumerate(batches[4:], 5):
        model_c.feed_data(b)
        model_c.optimize_parameters(i)

    for name, got, want in [
            ('params', model_c.params, model_a.params),
            ('ema', model_c.ema_params, model_a.ema_params)]:
        for g_leaf, w_leaf in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(g_leaf, np.float32),
                                       np.asarray(w_leaf, np.float32),
                                       rtol=2e-5, atol=2e-6, err_msg=name)
