"""DFDNet parity vs the reference torch implementation + face_util math.

The reference DFDNet constructs a torchvision-backed VGGFeatureExtractor
(not available here), so the fixture monkeypatches
basicsr.archs.dfdnet_arch.VGGFeatureExtractor with a faithful plain-torch
stand-in (same module names -> same state-dict keys) and drives the REAL
reference DFDNet forward (dfdnet_arch.py:125-158), spectral norm and all,
against the jnp implementation via the checkpoint converter."""

from collections import OrderedDict

import numpy as np
import pytest

import jax.numpy as jnp

from reference_util import load_reference

torch = pytest.importorskip('torch')
nn = torch.nn

# part boxes in 512-scale coords, all within [0, 256) so a 256x256 test
# input keeps every scaled crop in bounds
_LOCATIONS = {
    'left_eye': [64, 64, 128, 128],
    'right_eye': [160, 64, 224, 128],
    'nose': [96, 128, 160, 192],
    'mouth': [96, 192, 160, 248],
}


class _RefVGG(nn.Module):
    """Stand-in for the reference VGGFeatureExtractor (vgg_arch.py:78-163):
    named Sequential (same state-dict keys), [0,1]-ImageNet input norm,
    range_norm, dict-of-features forward."""

    def __init__(self, layer_name_list, vgg_type='vgg19',
                 use_input_norm=True, range_norm=False, requires_grad=False):
        super().__init__()
        from bsvd_tpu.archs.vgg_arch import vgg_names
        names = vgg_names(vgg_type)
        max_idx = max(names.index(v) for v in layer_name_list)
        mods = OrderedDict()
        cin = 3
        g = torch.Generator().manual_seed(7)
        for name in names[:max_idx + 1]:
            if name.startswith('conv'):
                block = int(name[4])
                cout = min(64 * 2 ** (block - 1), 512)
                conv = nn.Conv2d(cin, cout, 3, padding=1)
                with torch.no_grad():
                    std = (2.0 / (cin * 9)) ** 0.5
                    conv.weight.copy_(std * torch.randn(conv.weight.shape,
                                                        generator=g))
                    conv.bias.copy_(0.01 * torch.randn(conv.bias.shape,
                                                       generator=g))
                mods[name] = conv
                cin = cout
            elif name.startswith('relu'):
                mods[name] = nn.ReLU(inplace=False)
            elif name.startswith('pool'):
                mods[name] = nn.MaxPool2d(2, 2)
        self.vgg_net = nn.Sequential(mods)
        self.layer_name_list = list(layer_name_list)
        self.use_input_norm = use_input_norm
        self.range_norm = range_norm
        self.register_buffer(
            'mean', torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1))
        self.register_buffer(
            'std', torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1))

    def forward(self, x):
        if self.range_norm:
            x = (x + 1) / 2
        if self.use_input_norm:
            x = (x - self.mean) / self.std
        out = {}
        for key, layer in self.vgg_net._modules.items():
            x = layer(x)
            if key in self.layer_name_list:
                out[key] = x.clone()
        return out


def _fake_dict():
    g = torch.Generator().manual_seed(11)
    sizes = {'256': (128, 8, 8), '128': (256, 6, 6), '64': (512, 4, 4),
             '32': (512, 3, 3)}
    parts = ('left_eye', 'right_eye', 'nose', 'mouth')
    return {s: {p: torch.randn((3, c, h, w), generator=g)
                for p in parts} for s, (c, h, w) in sizes.items()}


@pytest.fixture(scope='module')
def dfd_pair(tmp_path_factory):
    load_reference()
    import basicsr.archs.dfdnet_arch as ref_mod
    dict_path = tmp_path_factory.mktemp('dfd') / 'dict.pth'
    face_dict = _fake_dict()
    torch.save(face_dict, str(dict_path))
    orig = ref_mod.VGGFeatureExtractor
    ref_mod.VGGFeatureExtractor = _RefVGG
    try:
        torch.manual_seed(3)
        ref = ref_mod.DFDNet(64, dict_path=str(dict_path)).eval()
    finally:
        ref_mod.VGGFeatureExtractor = orig

    from bsvd_tpu.archs.dfdnet_arch import DFDNet, convert_torch_dfdnet
    state = {k: v.numpy() for k, v in ref.state_dict().items()
             if not k.startswith(('mean', 'std'))
             and 'vgg_extractor.mean' not in k
             and 'vgg_extractor.std' not in k}
    mine = DFDNet(64, face_dict={
        s: {p: np.transpose(v.numpy(), (0, 2, 3, 1))
            for p, v in d.items()} for s, d in face_dict.items()})
    mine.params = convert_torch_dfdnet(state)
    return ref, mine


def test_dfdnet_forward_parity(dfd_pair):
    ref, mine = dfd_pair
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32)
    locs = [torch.tensor(np.asarray(_LOCATIONS[p])[None])
            for p in ('left_eye', 'right_eye', 'nose', 'mouth')]
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), locs).numpy()
    got = np.asarray(mine(jnp.asarray(x),
                          [np.asarray(v) for v in locs]))
    assert got.shape == ref_out.shape == (1, 3, 256, 256)
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-3)


def test_adain_matches_reference(dfd_pair):
    del dfd_pair
    load_reference()
    from basicsr.archs.dfdnet_util import adaptive_instance_normalization \
        as ref_adain
    from bsvd_tpu.archs.dfdnet_arch import adaptive_instance_normalization
    rng = np.random.default_rng(1)
    content = rng.standard_normal((2, 8, 5, 7)).astype(np.float32)
    style = (2 * rng.standard_normal((2, 8, 5, 7)) + 1).astype(np.float32)
    ref_out = ref_adain(torch.from_numpy(content),
                        torch.from_numpy(style)).numpy()
    got = adaptive_instance_normalization(
        jnp.asarray(np.transpose(content, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(style, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref_out, rtol=1e-4, atol=1e-5)


def test_nearest_resize_matches_torch():
    from bsvd_tpu.archs.dfdnet_arch import resize_nearest
    x = np.random.default_rng(2).standard_normal((1, 4, 5, 9)).astype(
        np.float32)
    ref = torch.nn.functional.interpolate(torch.from_numpy(x),
                                          size=(11, 7)).numpy()
    got = resize_nearest(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 11, 7)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref)


# ------------------------------------------------------------- face_util
def test_umeyama_recovers_similarity():
    from bsvd_tpu.utils.face_util import umeyama_similarity
    rng = np.random.default_rng(3)
    src = rng.uniform(0, 100, (5, 2))
    theta, scale = 0.4, 1.7
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    dst = scale * src @ rot.T + np.array([10., -4.])
    m = umeyama_similarity(src, dst)
    np.testing.assert_allclose(m[:, :2], scale * rot, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(m[:, 2], [10., -4.], rtol=1e-6, atol=1e-6)
    # maps src onto dst exactly for an exact similarity
    mapped = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, rtol=1e-7, atol=1e-6)


def test_warp_crop_and_paste_roundtrip(tmp_path):
    """warp to the template and paste back: the face region of the output
    approximates the (upscaled) input."""
    from bsvd_tpu.utils.face_util import FaceRestorationHelper
    helper = FaceRestorationHelper(upscale_factor=1, face_size=128)
    rng = np.random.default_rng(4)
    img = (rng.uniform(0, 255, (160, 160, 3))).astype(np.uint8)
    import cv2
    img = cv2.GaussianBlur(img, (15, 15), 5)   # smooth so warps interpolate
    helper.input_img = img  # RGB
    # landmarks: the template itself scaled into this image -> near-identity
    helper.all_landmarks_5 = [helper.face_template * (160 / 128.)]
    helper.warp_crop_faces(save_cropped_path=str(tmp_path / 'crop.png'))
    assert (tmp_path / 'crop_00.png').exists()
    assert helper.cropped_faces[0].shape == (128, 128, 3)
    # restore == cropped face (identity restoration), paste back
    helper.add_restored_face(
        cv2.cvtColor(helper.cropped_faces[0], cv2.COLOR_RGB2BGR))
    out = helper.paste_faces_to_input_image(str(tmp_path / 'final.png'))
    assert (tmp_path / 'final.png').exists()
    assert out.shape == (160, 160, 3)
    # center of the pasted region matches the input (BGR) closely
    center_in = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)[60:100, 60:100]
    diff = np.abs(out[60:100, 60:100] - center_in.astype(np.float32))
    assert diff.mean() < 3.0


def test_get_part_location_formula():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'inf_dfdnet', 'inference/inference_dfdnet.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rng = np.random.default_rng(5)
    lm = rng.uniform(0, 512, (68, 2))
    locs = mod.get_part_location(lm)
    assert len(locs) == 4
    # reference formula for the nose (inference_dfdnet.py:37-42)
    pts = lm[list(range(29, 36))]
    mean = pts.mean(0)
    half = max((pts.max(0) - pts.min(0)).max() / 2, 16)
    exp = np.hstack((mean - half + 1, mean + half)).astype(int)
    np.testing.assert_array_equal(locs[2][0], exp)
    for loc in locs:
        assert loc.shape == (1, 4)
        assert (loc[0, 2:] >= loc[0, :2]).all()
