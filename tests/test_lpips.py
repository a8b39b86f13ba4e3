"""LPIPS-VGG math-path tests (the external lpips package is absent here, so
these validate the pipeline's invariants + the lin-head weight conversion
layout rather than absolute values; absolute parity needs the external
weights, see bsvd_tpu/metrics/lpips.py docstring)."""

import numpy as np

import jax
import jax.numpy as jnp

from bsvd_tpu.metrics.lpips import _CHNS, lpips_apply, lpips_init


def _rand_pair(seed, n=2, hw=40):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(-1, 1, (n, hw, hw, 3)).astype('float32')),
            jnp.asarray(rng.uniform(-1, 1, (n, hw, hw, 3)).astype('float32')))


def test_lpips_identity_symmetry_positivity():
    params = lpips_init(jax.random.PRNGKey(0))
    x0, x1 = _rand_pair(1)
    d_same = np.asarray(lpips_apply(params, x0, x0))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    d01 = np.asarray(lpips_apply(params, x0, x1))
    d10 = np.asarray(lpips_apply(params, x1, x0))
    np.testing.assert_allclose(d01, d10, rtol=1e-5)
    assert (d01 > 0).all()
    assert d01.shape == (2,)


def test_lpips_batch_consistency():
    params = lpips_init(jax.random.PRNGKey(0))
    x0, x1 = _rand_pair(2)
    batched = np.asarray(lpips_apply(params, x0, x1))
    singles = [float(lpips_apply(params, x0[i:i + 1], x1[i:i + 1])[0])
               for i in range(2)]
    np.testing.assert_allclose(batched, singles, rtol=1e-5)


def test_lpips_lin_weight_conversion_layout(tmp_path, monkeypatch):
    """load_lpips converts lpips-package lin heads (1,C,1,1 OIHW) and a
    torchvision vgg16 state dict into the params tree."""
    import pytest
    torch = pytest.importorskip('torch')
    from bsvd_tpu.archs.vgg_arch import vgg_feature_init, vgg_names
    from bsvd_tpu.metrics.lpips import _LAYERS, load_lpips

    g = torch.Generator().manual_seed(0)
    lin_state = {f'lin{i}.model.1.weight':
                 torch.rand((1, c, 1, 1), generator=g)
                 for i, c in enumerate(_CHNS)}
    lin_path = tmp_path / 'lpips_vgg.pth'
    torch.save(lin_state, str(lin_path))

    # minimal torchvision-layout vgg16 state dict (convs only, through pool5)
    names = vgg_names('vgg16')
    vgg_state, cin = {}, 3
    g2 = torch.Generator().manual_seed(1)
    for idx, name in enumerate(names):
        if name.startswith('conv'):
            block = int(name[4])
            cout = min(64 * 2 ** (block - 1), 512)
            vgg_state[f'features.{idx}.weight'] = 0.05 * torch.randn(
                (cout, cin, 3, 3), generator=g2)
            vgg_state[f'features.{idx}.bias'] = 0.05 * torch.randn(
                (cout,), generator=g2)
            cin = cout
    vgg_path = tmp_path / 'vgg16.pth'
    torch.save(vgg_state, str(vgg_path))

    params, fn = load_lpips(str(lin_path), str(vgg_path))
    for i, c in enumerate(_CHNS):
        assert params['lins'][i].shape == (1, 1, c, 1)
        np.testing.assert_allclose(
            np.asarray(params['lins'][i])[0, 0, :, 0],
            lin_state[f'lin{i}.model.1.weight'].numpy()[0, :, 0, 0])
    x0, x1 = _rand_pair(3, n=1, hw=36)
    d = np.asarray(fn(params, x0, x1))
    assert d.shape == (1,) and np.isfinite(d).all() and d[0] > 0
