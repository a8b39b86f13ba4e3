"""Tooling-script coverage: sub-image extraction, meta info, REDS regroup,
HiFaceGAN degradation prep, and the pth->npz converter round-trip
(reference behaviors: BasicSR/scripts/data_preparation/*.py,
scripts/model_conversion/*)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts')


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_extract_subimages_and_meta_info(tmp_path):
    ex = _load('data_preparation/extract_subimages.py', '_t_extract')
    mi = _load('data_preparation/generate_meta_info.py', '_t_meta')
    src = tmp_path / 'src'
    os.makedirs(src)
    rng = np.random.default_rng(0)
    cv2.imwrite(str(src / 'imgx4.png'),
                rng.integers(0, 255, (100, 140, 3), dtype=np.uint8))
    out = tmp_path / 'sub'
    ex.extract_subimages(str(src), str(out), crop_size=64, step=48,
                         n_thread=1)
    names = sorted(os.listdir(out))
    # 100x140, crop 64 step 48 -> h offsets {0, 36}, w offsets {0, 48, 76}
    assert len(names) == 6
    assert names[0] == 'img_s001.png'          # x4 suffix stripped
    assert cv2.imread(str(out / names[0])).shape == (64, 64, 3)

    meta = tmp_path / 'meta.txt'
    mi.generate_meta_info(str(out), str(meta))
    lines = meta.read_text().splitlines()
    assert len(lines) == 6
    assert lines[0] == 'img_s001.png (64,64,3)'


def test_regroup_reds(tmp_path):
    rg = _load('data_preparation/regroup_reds_dataset.py', '_t_regroup')
    train, val = tmp_path / 'train', tmp_path / 'val'
    os.makedirs(train)
    for i in range(2):
        os.makedirs(val / f'{i:03d}')
        (val / f'{i:03d}' / 'f0.png').write_bytes(b'x')
    rg.regroup_reds_dataset(str(train), str(val))
    assert sorted(os.listdir(train)) == ['240', '241']
    assert (train / '240' / 'f0.png').exists()


@pytest.mark.parametrize('deg', ['sr4x', 'denoise', 'deblur', 'jpeg', '16x',
                                 'face_renov'])
def test_prepare_hifacegan_dataset(tmp_path, deg):
    pr = _load('data_preparation/prepare_hifacegan_dataset.py', '_t_hfgprep')
    gt = tmp_path / 'gt'
    os.makedirs(gt)
    rng = np.random.default_rng(1)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), (5, 5), 2)
    cv2.imwrite(str(gt / 'a.png'), img)
    lq_dir = tmp_path / 'lq'
    pr.create_training_dataset(deg, str(gt), str(lq_dir), seed=0)
    lq = cv2.imread(str(lq_dir / 'a.png'))
    assert lq.shape == img.shape
    assert not np.array_equal(lq, img)         # actually degraded


def test_convert_to_npz_roundtrip(tmp_path):
    torch = pytest.importorskip('torch')
    import jax
    import jax.numpy as jnp
    from bsvd_tpu.archs import build_network
    from bsvd_tpu.models.checkpoint import flatten_tree

    arch = {'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
            'num_feat': 8, 'num_block': 1, 'upscale': 4}
    net = build_network(dict(arch))
    sd = {}
    for pth, leaf in flatten_tree(net.params).items():
        a = np.asarray(leaf)
        if a.ndim == 4:
            a = np.transpose(a, (3, 2, 0, 1))   # HWIO -> OIHW
        elif a.ndim == 2:
            a = a.T
        key = pth.replace('/', '.')
        key = key[:-2] + '.weight' if key.endswith('.w') else key
        key = key[:-2] + '.bias' if key.endswith('.b') else key
        sd[key] = torch.from_numpy(a.copy())
    pth_path = tmp_path / 'tiny.pth'
    torch.save({'params': sd}, str(pth_path))

    cv = _load('model_conversion/convert_to_npz.py', '_t_convert')
    npz_path = tmp_path / 'tiny.npz'
    old_argv = sys.argv
    sys.argv = ['convert_to_npz.py', '--arch', repr(arch),
                '--input', str(pth_path), '--output', str(npz_path)]
    try:
        cv.main()
    finally:
        sys.argv = old_argv

    net2 = build_network(dict(arch))
    net2.load(str(npz_path), 'params')
    for a, b in zip(jax.tree.leaves(net.params), jax.tree.leaves(net2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y = net2(jnp.zeros((1, 3, 8, 8)))
    assert y.shape == (1, 3, 32, 32)


# ---------------------------------------------------------------------------
# TF-free tfrecords extractor + matlab-script ports + dataset downloader
# ---------------------------------------------------------------------------

def _varint(n):
    out = b''
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _pb_field(num, wire, payload):
    key = _varint((num << 3) | wire)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    return key + _varint(payload)


def _tf_example(shape, data):
    """Hand-serialize a tf.train.Example with int64 'shape' + bytes 'data'."""
    int64_list = b''.join(_pb_field(1, 0, v) for v in shape)
    feat_shape = _pb_field(3, 2, int64_list)           # Feature.int64_list
    feat_data = _pb_field(1, 2, _pb_field(1, 2, data))  # Feature.bytes_list
    entry_s = _pb_field(1, 2, b'shape') + _pb_field(2, 2, feat_shape)
    entry_d = _pb_field(1, 2, b'data') + _pb_field(2, 2, feat_data)
    features = _pb_field(1, 2, entry_s) + _pb_field(1, 2, entry_d)
    return _pb_field(1, 2, features)                   # Example.features


def _write_tfrecord(path, payloads):
    import struct
    with open(path, 'wb') as f:
        for p in payloads:
            f.write(struct.pack('<Q', len(p)) + b'\0\0\0\0' + p + b'\0\0\0\0')


def test_extract_images_from_tfrecords_ffhq(tmp_path):
    tfx = _load('data_preparation/extract_images_from_tfrecords.py', '_t_tfx')
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (3, 16, 16), dtype=np.uint8)
            for _ in range(2)]
    rec = tmp_path / 'ffhq-r04.tfrecords'
    _write_tfrecord(str(rec), [_tf_example([3, 16, 16], im.tobytes())
                               for im in imgs])
    n = tfx.convert_ffhq_tfrecords(str(rec), 4, str(tmp_path),
                                   save_type='img')
    assert n == 2
    out0 = cv2.imread(str(tmp_path / 'ffhq_16' / '00000000.png'))
    # extractor writes BGR; records hold CHW RGB
    np.testing.assert_array_equal(
        out0, imgs[0].transpose(1, 2, 0)[:, :, ::-1])


def test_extract_images_from_tfrecords_celeba_lmdb(tmp_path):
    pytest.importorskip('lmdb')
    tfx = _load('data_preparation/extract_images_from_tfrecords.py', '_t_tfx2')
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    rec = tmp_path / 'validation-r03.tfrecords'
    _write_tfrecord(str(rec), [_tf_example([8, 8, 3], img.tobytes())])
    tfx.convert_celeba_tfrecords(str(rec), 3, str(tmp_path), save_type='lmdb')
    from bsvd_tpu.utils.file_client import FileClient
    client = FileClient('lmdb', db_paths=[str(
        tmp_path / 'celeba_8_validation.lmdb')], client_keys=['x'])
    buf = client.get('00000000/r03', 'x')
    got = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(got, img[:, :, ::-1])


def test_generate_bicubic_img(tmp_path):
    gb = _load('matlab_scripts/generate_bicubic_img.py', '_t_genbic')
    from bsvd_tpu.utils.matlab_functions import imresize
    src = tmp_path / 'src'
    os.makedirs(src)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (37, 41, 3), dtype=np.uint8)
    cv2.imwrite(str(src / 'pic.png'), img)
    gb.process_folder(str(src), mod_scale=4, up_scale=2,
                      save_mod=str(tmp_path / 'mod'),
                      save_lr=str(tmp_path / 'lr'),
                      save_bic=str(tmp_path / 'bic'))
    mod = cv2.imread(str(tmp_path / 'mod' / 'pic.png'))
    np.testing.assert_array_equal(mod, img[:36, :40])
    lr = cv2.imread(str(tmp_path / 'lr' / 'pic.png'))
    want = imresize(img[:36, :40].astype(np.float64) / 255.0, 0.5)
    np.testing.assert_array_equal(
        lr, (np.clip(want, 0, 1) * 255.0).round().astype(np.uint8))
    assert cv2.imread(str(tmp_path / 'bic' / 'pic.png')).shape == (36, 40, 3)


def test_download_datasets_unzip_flattens(tmp_path):
    dd = _load('data_preparation/download_datasets.py', '_t_dlsets')
    import zipfile
    zpath = tmp_path / 'Set5.zip'
    with zipfile.ZipFile(zpath, 'w') as zf:
        zf.writestr('Set5/baby.png', b'png-bytes')
    dd._unzip(str(zpath))
    assert (tmp_path / 'Set5' / 'baby.png').read_bytes() == b'png-bytes'
