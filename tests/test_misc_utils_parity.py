"""Parity tests for small framework utilities that had no direct coverage:
flow IO (reference BasicSR/basicsr/utils/flow_util.py), USM sharpening
(reference img_process_util.py), and the FastDVDnet-style sequence loaders
(reference Experimental_root/data/utils_common.py)."""

import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_util import REFERENCE_ROOT  # noqa: E402


def _ref_module(relpath, name):
    """Import one reference module by path (avoids pulling the whole
    basicsr package just for a leaf util)."""
    import importlib.util
    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.isfile(path):
        pytest.skip('reference tree not available')
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ref_flow():
    return _ref_module('BasicSR/basicsr/utils/flow_util.py', 'ref_flow_util')


@pytest.fixture(scope='module')
def ref_imgproc():
    return _ref_module('BasicSR/basicsr/utils/img_process_util.py',
                       'ref_img_process_util')


def test_flo_io_cross_parity(ref_flow, tmp_path):
    """.flo files written by either side read back identically on both."""
    from bsvd_tpu.utils.flow_util import flowread, flowwrite
    rng = np.random.default_rng(0)
    flow = rng.normal(0, 3, (12, 17, 2)).astype(np.float32)

    mine_path = str(tmp_path / 'mine.flo')
    ref_path = str(tmp_path / 'ref.flo')
    flowwrite(flow, mine_path)
    ref_flow.flowwrite(flow, ref_path)
    assert open(mine_path, 'rb').read() == open(ref_path, 'rb').read()
    np.testing.assert_array_equal(flowread(mine_path), flow)
    np.testing.assert_array_equal(ref_flow.flowread(mine_path), flow)
    np.testing.assert_array_equal(flowread(ref_path), flow)


@pytest.mark.parametrize('concat_axis', [0, 1])
def test_quantized_flow_parity(ref_flow, tmp_path, concat_axis):
    """Quantized dx/dy image round-trip matches the reference bit-for-bit
    (same levels, same clamping, same denorm)."""
    from bsvd_tpu.utils.flow_util import flowread, flowwrite, quantize_flow
    rng = np.random.default_rng(1)
    flow = rng.normal(0, 0.01, (8, 10, 2)).astype(np.float32)

    dx, dy = quantize_flow(flow, max_val=0.02, norm=True)
    rdx, rdy = ref_flow.quantize_flow(flow, max_val=0.02, norm=True)
    np.testing.assert_array_equal(dx, rdx)
    np.testing.assert_array_equal(dy, rdy)

    mine_q = str(tmp_path / f'q{concat_axis}.png')
    flowwrite(flow, mine_q, quantize=True, concat_axis=concat_axis)
    got = flowread(mine_q, quantize=True, concat_axis=concat_axis)
    ref_got = ref_flow.flowread(mine_q, quantize=True,
                                concat_axis=concat_axis)
    # ours dequantizes in float32, the reference in float64
    np.testing.assert_allclose(got, ref_got, rtol=1e-6)
    # sanity: dequantized flow reconstructs the (normalized, clipped)
    # original within one quantization level of the per-axis range
    h, w = flow.shape[:2]
    norm = flow / np.array([w, h], np.float32) / 0.02
    clipped = np.clip(norm, -1, 1) * np.array([w, h], np.float32) * 0.02
    level = 2 * 0.02 * max(h, w) / 255
    assert np.max(np.abs(got - clipped)) <= level + 1e-6


def test_usm_sharp_numpy_parity(ref_imgproc):
    from bsvd_tpu.utils.img_process_util import usm_sharp
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
    got = usm_sharp(img, weight=0.5, radius=13, threshold=10)
    want = ref_imgproc.usm_sharp(img, weight=0.5, radius=13, threshold=10)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_usm_sharp_jax_matches_torch_module(ref_imgproc):
    """The batched jnp USM (sigma=0 -> cv2 default sigma, separable kernel)
    matches the reference torch USMSharp module."""
    torch = pytest.importorskip('torch')
    import jax.numpy as jnp
    from bsvd_tpu.utils.img_process_util import usm_sharp_jax
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (2, 3, 32, 36)).astype(np.float32)  # NCHW
    radius = 13

    ref = ref_imgproc.USMSharp(radius=radius)
    with torch.no_grad():
        want = ref(torch.from_numpy(img)).numpy()

    got = usm_sharp_jax(jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                        weight=0.5, radius=radius, threshold=10)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_open_sequence_parity(tmp_path):
    """open_sequence/open_image: same normalization, ordering, gray mode,
    and CHW layout as the reference loader (utils_common.py:97-126)."""
    from bsvd_tpu.data.utils_common import open_image, open_sequence
    ref_uc = _ref_module('Experimental_root/data/utils_common.py',
                         'ref_utils_common')
    rng = np.random.default_rng(4)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f'{i:02d}.png'),
                    rng.integers(0, 255, (20, 24, 3), dtype=np.uint8))

    got, _, _ = open_sequence(str(tmp_path), gray_mode=False,
                              expand_if_needed=False, max_num_fr=2)
    want, _, _ = ref_uc.open_sequence(str(tmp_path), False,
                                      expand_if_needed=False, max_num_fr=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)

    # gray mode: the reference returns (T, H, W) (its docstring claims C=1
    # but the code never adds the axis); we normalize to (T, 1, H, W) so
    # CHW handling stays uniform — values must still match exactly
    got_g, _, _ = open_sequence(str(tmp_path), gray_mode=True,
                                expand_if_needed=False, max_num_fr=3)
    want_g, _, _ = ref_uc.open_sequence(str(tmp_path), True,
                                        expand_if_needed=False, max_num_fr=3)
    assert got_g.shape == (3, 1, 20, 24) and want_g.shape == (3, 20, 24)
    np.testing.assert_allclose(np.asarray(got_g)[:, 0], np.asarray(want_g),
                               rtol=0, atol=0)

    g1, _, _ = open_image(str(tmp_path / '00.png'), gray_mode=False)
    w1, _, _ = ref_uc.open_image(str(tmp_path / '00.png'), False,
                                 expand_axis0=False)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(w1))
