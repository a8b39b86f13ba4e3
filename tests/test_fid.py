"""FID stack parity.

torchvision is not in this env (reference inception.py builds on it), so the
torch oracle here reimplements the FID-patched InceptionV3 in plain torch,
mirroring reference BasicSR/basicsr/archs/inception.py:189-307 (patched A/C/E
blocks: exclude-pad avg pool; Mixed_7c max pool) and torchvision's B/D
blocks. Its state_dict uses the real module names, so the converter is
exercised on the exact key layout of pt_inception-2015-12-05-6726825d.pth.
calculate_fid is tested against the reference's own implementation (imported
via the class-def-only torchvision stubs in reference_util)."""

import numpy as np
import pytest

import jax.numpy as jnp

from reference_util import load_reference

torch = pytest.importorskip('torch')
nn = torch.nn
F = torch.nn.functional


class _BC(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=0.001) + relu."""

    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    # the FID patch: TF avg pool excludes padding (reference inception.py:206)
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class _A(nn.Module):
    def __init__(self, cin, pf):
        super().__init__()
        self.branch1x1 = _BC(cin, 64, kernel_size=1)
        self.branch5x5_1 = _BC(cin, 48, kernel_size=1)
        self.branch5x5_2 = _BC(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BC(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BC(cin, pf, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x))], 1)


class _B(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _BC(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BC(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class _C(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _BC(cin, 192, kernel_size=1)
        self.branch7x7_1 = _BC(cin, c7, kernel_size=1)
        self.branch7x7_2 = _BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BC(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BC(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BC(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BC(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x))], 1)


class _D(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _BC(cin, 192, kernel_size=1)
        self.branch3x3_2 = _BC(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BC(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _BC(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BC(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BC(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class _E(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = _BC(cin, 320, kernel_size=1)
        self.branch3x3_1 = _BC(cin, 384, kernel_size=1)
        self.branch3x3_2a = _BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BC(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BC(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BC(384, 384, kernel_size=(1, 3),
                                   padding=(0, 1))
        self.branch3x3dbl_3b = _BC(384, 384, kernel_size=(3, 1),
                                   padding=(1, 0))
        self.branch_pool = _BC(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        # Mixed_7c uses max pool (reference inception.py:292-297)
        pooled = (F.max_pool2d(x, 3, 1, 1) if self.pool == 'max' else _avg(x))
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(pooled)], 1)


class _FIDInceptionOracle(nn.Module):
    """fid_inception_v3 structure with real module names; forward returns
    the 4 feature blocks (reference inception.py:88-155)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _BC(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BC(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BC(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BC(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BC(80, 192, kernel_size=3)
        self.Mixed_5b = _A(192, 32)
        self.Mixed_5c = _A(256, 64)
        self.Mixed_5d = _A(288, 64)
        self.Mixed_6a = _B(288)
        self.Mixed_6b = _C(768, 128)
        self.Mixed_6c = _C(768, 160)
        self.Mixed_6d = _C(768, 160)
        self.Mixed_6e = _C(768, 192)
        self.Mixed_7a = _D(768)
        self.Mixed_7b = _E(1280, 'avg')
        self.Mixed_7c = _E(2048, 'max')

    def forward(self, x):
        out = []
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        out.append(x)
        x = F.max_pool2d(self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x)), 3, 2)
        out.append(x)
        for name in ('Mixed_5b', 'Mixed_5c', 'Mixed_5d', 'Mixed_6a',
                     'Mixed_6b', 'Mixed_6c', 'Mixed_6d', 'Mixed_6e'):
            x = getattr(self, name)(x)
        out.append(x)
        for name in ('Mixed_7a', 'Mixed_7b', 'Mixed_7c'):
            x = getattr(self, name)(x)
        out.append(F.adaptive_avg_pool2d(x, (1, 1)))
        return out


@pytest.fixture(scope='module')
def fid_pair():
    """(torch oracle in eval mode, my converted params) sharing one random
    state dict with randomized BN stats so conversion bugs cannot hide."""
    oracle = _FIDInceptionOracle()
    g = torch.Generator().manual_seed(0)
    sd = oracle.state_dict()
    for k, v in sd.items():
        if 'num_batches_tracked' in k:
            continue
        if 'running_var' in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif k.endswith('bn.weight'):
            sd[k] = 1.0 + 0.1 * torch.randn(v.shape, generator=g)
        elif 'conv.weight' in k:
            sd[k] = 0.05 * torch.randn(v.shape, generator=g)
        else:
            sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    oracle.load_state_dict(sd)
    oracle.eval()
    from bsvd_tpu.archs.inception_arch import convert_torch_state_dict
    params = convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()
         if 'num_batches_tracked' not in k})
    return oracle, params


def test_inception_all_blocks_parity(fid_pair):
    from bsvd_tpu.archs.inception_arch import inception_v3_apply
    oracle, params = fid_pair
    x = np.random.default_rng(0).uniform(-1, 1, (2, 3, 96, 96)).astype(
        np.float32)
    with torch.no_grad():
        ref_outs = oracle(torch.from_numpy(x))
    got = inception_v3_apply(params,
                             jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                             output_blocks=(0, 1, 2, 3), resize_input=False,
                             normalize_input=False)
    assert len(got) == len(ref_outs) == 4
    for i, (mine, theirs) in enumerate(zip(got, ref_outs)):
        mine = np.transpose(np.asarray(mine), (0, 3, 1, 2))
        np.testing.assert_allclose(mine, theirs.numpy(), rtol=2e-3,
                                   atol=2e-4, err_msg=f'block {i}')


def test_inception_resize_and_normalize_parity(fid_pair):
    """resize_input=True path (reference inception.py:139-143): bilinear to
    299 with align_corners=False, then 2x-1, end to end on pool3."""
    from bsvd_tpu.archs.inception_arch import inception_v3_apply
    oracle, params = fid_pair
    x = np.random.default_rng(1).uniform(0, 1, (1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        xt = F.interpolate(torch.from_numpy(x), size=(299, 299),
                           mode='bilinear', align_corners=False)
        ref_out = oracle(2 * xt - 1)[3].numpy()
    got = inception_v3_apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        output_blocks=(3,), resize_input=True, normalize_input=True)[0]
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=3e-4)


def test_resize_bilinear_matches_torch_interpolate():
    from bsvd_tpu.archs.inception_arch import resize_bilinear
    x = np.random.default_rng(2).standard_normal((2, 3, 37, 53)).astype(
        np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(299, 299),
                        mode='bilinear', align_corners=False).numpy()
    got = resize_bilinear(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 299,
                          299)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)


def test_calculate_fid_parity_and_identity():
    load_reference()
    from basicsr.metrics.fid import calculate_fid as ref_fid
    from bsvd_tpu.metrics.fid import calculate_fid
    rng = np.random.default_rng(3)
    f1 = rng.standard_normal((64, 16))
    f2 = rng.standard_normal((80, 16)) + 0.3
    mu1, s1 = f1.mean(0), np.cov(f1, rowvar=False)
    mu2, s2 = f2.mean(0), np.cov(f2, rowvar=False)
    mine = calculate_fid(mu1, s1, mu2, s2)
    theirs = ref_fid(mu1, s1, mu2, s2)
    np.testing.assert_allclose(mine, theirs, rtol=1e-8)
    assert calculate_fid(mu1, s1, mu1, s1) == pytest.approx(0.0, abs=1e-6)


def test_extract_inception_features_batching(fid_pair):
    """extract_inception_features: batches concatenate, NCHW transposes."""
    from bsvd_tpu.metrics.fid import extract_inception_features
    from bsvd_tpu.archs.inception_arch import inception_v3_apply
    _, params = fid_pair

    def feat_fn(p, x):
        f = inception_v3_apply(p, x, output_blocks=(3,), resize_input=False,
                               normalize_input=False)[0]
        return f.reshape(f.shape[0], -1)

    rng = np.random.default_rng(4)
    batches = [rng.uniform(-1, 1, (2, 3, 75, 75)).astype(np.float32)
               for _ in range(2)]
    feats = extract_inception_features(iter(batches), (params, feat_fn))
    assert feats.shape == (4, 2048)
    single = feat_fn(params, jnp.asarray(
        np.transpose(batches[0], (0, 2, 3, 1))))
    np.testing.assert_allclose(feats[:2], np.asarray(single), rtol=1e-5,
                               atol=1e-5)
