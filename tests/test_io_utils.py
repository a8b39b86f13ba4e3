"""download_util (against a localhost HTTP server — no egress needed),
the memcached FileClient backend (against an in-process fake server
speaking the memcached text protocol), and publish_models' sha logic."""

import http.server
import os
import socket
import socketserver
import threading

import numpy as np
import pytest


# ------------------------------------------------------------- download
@pytest.fixture()
def http_file_server(tmp_path):
    root = tmp_path / 'srv'
    root.mkdir()
    (root / 'model.bin').write_bytes(os.urandom(70000))

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

    httpd = socketserver.TCPServer(('127.0.0.1', 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield root, f'http://127.0.0.1:{httpd.server_address[1]}'
    httpd.shutdown()


def test_load_file_from_url_and_cache(http_file_server, tmp_path):
    root, base = http_file_server
    from bsvd_tpu.utils.download_util import load_file_from_url
    out_dir = str(tmp_path / 'models')
    path = load_file_from_url(f'{base}/model.bin', model_dir=out_dir)
    assert open(path, 'rb').read() == (root / 'model.bin').read_bytes()
    # cached: no re-download (delete the server file, call again)
    (root / 'model.bin').unlink()
    assert load_file_from_url(f'{base}/model.bin', model_dir=out_dir) == path


def test_save_response_content_chunks(http_file_server, tmp_path):
    root, base = http_file_server
    import requests
    from bsvd_tpu.utils.download_util import save_response_content
    dest = str(tmp_path / 'out.bin')
    with requests.get(f'{base}/model.bin', stream=True) as r:
        save_response_content(r, dest, file_size=70000, chunk_size=4096)
    assert open(dest, 'rb').read() == (root / 'model.bin').read_bytes()


# ------------------------------------------------------------ memcached
@pytest.fixture()
def fake_memcached():
    store = {'img_001': os.urandom(5000), 'hello': b'world'}
    srv = socket.socket()
    srv.bind(('127.0.0.1', 0))
    srv.listen(1)

    def handle(conn):
        with conn:
            buf = b''
            while True:
                try:
                    data = conn.recv(4096)
                except OSError:
                    break
                if not data:
                    break
                buf += data
                while b'\r\n' in buf:
                    line, buf = buf.split(b'\r\n', 1)
                    parts = line.decode().split()
                    if not parts:
                        continue
                    if parts[0] == 'get':
                        key = parts[1]
                        if key in store:
                            v = store[key]
                            conn.sendall(
                                f'VALUE {key} 0 {len(v)}\r\n'.encode()
                                + v + b'\r\nEND\r\n')
                        else:
                            conn.sendall(b'END\r\n')

    def serve():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=handle, args=(conn,), daemon=True).start()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    yield store, f'127.0.0.1:{srv.getsockname()[1]}'
    srv.close()


def test_memcached_backend(fake_memcached, tmp_path):
    store, addr = fake_memcached
    from bsvd_tpu.utils.file_client import FileClient
    client = FileClient('memcached', server_list_cfg=addr)
    assert client.get('img_001') == store['img_001']
    assert client.get_text('hello') == 'world'
    assert client.get('missing') is None
    # server-list file form (mmcv layout)
    cfg = tmp_path / 'servers.txt'
    cfg.write_text(f'# memcached servers\n{addr}\n')
    client2 = FileClient('memcached', server_list_cfg=str(cfg))
    assert client2.get('hello') == b'world'


# ---------------------------------------------------------- publish sha
def test_publish_models_sha_rename(tmp_path, monkeypatch):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'publish_models', 'scripts/publish_models.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    p = tmp_path / 'net_g.npz'
    np.savez(str(p), **{'params.stage0.w': np.zeros(3)})
    renamed = mod.update_sha([str(p)], assume_yes=True)
    assert len(renamed) == 1 and '-' in os.path.basename(renamed[0])
    sha = mod.file_sha8(renamed[0])
    assert renamed[0].endswith(f'-{sha}.npz')
    # stable: rerun renames nothing
    assert mod.update_sha(renamed, assume_yes=True) == renamed
    # stale hash is refreshed
    stale = tmp_path / 'other-deadbeef.npz'
    np.savez(str(stale), **{'params_ema.x': np.ones(2)})
    out = mod.update_sha([str(stale)], assume_yes=True)
    assert not out[0].endswith('-deadbeef.npz')
    assert out[0].endswith(f'-{mod.file_sha8(out[0])}.npz')


def test_publish_models_preserves_descriptive_names(tmp_path):
    """A trailing '-<segment>' that is not an 8-hex hash is part of the
    name (bsvd-64.pth must become bsvd-64-<sha>.pth, not bsvd-<sha>.pth)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'publish_models2', 'scripts/publish_models.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    p = tmp_path / 'bsvd-64.npz'
    np.savez(str(p), **{'params.w': np.ones(2)})
    out = mod.update_sha([str(p)], assume_yes=True)
    base = os.path.basename(out[0])
    assert base.startswith('bsvd-64-') and base.endswith('.npz')


def test_publish_models_check_keys_warns_on_missing_params(tmp_path, capsys):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'publish_models3', 'scripts/publish_models.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    p = tmp_path / 'broken.npz'
    np.savez(str(p), **{'opt_state.count': np.zeros(1)})
    mod.check_keys(str(p), assume_yes=True)
    assert 'does not have' in capsys.readouterr().out
    good = tmp_path / 'good.npz'
    np.savez(str(good), **{'params_ema.w': np.ones(1)})
    mod.check_keys(str(good), assume_yes=True)
    assert 'does not have' not in capsys.readouterr().out


def test_memcached_rejects_bad_keys_and_surfaces_errors(fake_memcached):
    _, addr = fake_memcached
    from bsvd_tpu.utils.file_client import FileClient
    client = FileClient('memcached', server_list_cfg=addr)
    with pytest.raises(ValueError):
        client.get('key with space')
    with pytest.raises(ValueError):
        client.get('k' * 251)


def test_lmdb_compat_readonly_does_not_create_dir(tmp_path):
    from bsvd_tpu.utils import _lmdb_compat as kv
    missing = tmp_path / 'nope.lmdb'
    with pytest.raises(FileNotFoundError):
        kv.open(str(missing), readonly=True)
    assert not missing.exists()


def test_make_mesh_strict_raises_on_bad_spatial():
    from bsvd_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError):
        make_mesh(3, spatial=2)
    # non-strict degrades with a warning (the dryrun entry's mode)
    with pytest.warns(UserWarning):
        m = make_mesh(3, spatial=2, strict=False)
    assert dict(m.shape) == {'data': 3, 'spatial': 1}


def test_spectral_norm_checkpoint_conversion(tmp_path):
    """torch spectral_norm checkpoints store weight_orig/weight_u/weight_v;
    loading a reference SN discriminator must map them to (w, u) and drop v
    (regression: KeyError 'checkpoint missing parameter conv1/w')."""
    torch = pytest.importorskip('torch')
    from bsvd_tpu.archs import build_network
    from bsvd_tpu.convert.torch_generic import state_dict_to_tree

    net = build_network({'type': 'UNetDiscriminatorSN', 'num_in_ch': 3,
                         'num_feat': 8})

    conv = torch.nn.utils.spectral_norm(torch.nn.Conv2d(3, 8, 3))
    sd = {f'conv0.{k}': v for k, v in conv.state_dict().items()}
    assert any(k.endswith('weight_orig') for k in sd)
    tree = state_dict_to_tree({k: v.numpy() for k, v in sd.items()})
    assert tree['conv0']['w'].shape == (3, 3, 3, 8)      # HWIO of weight_orig
    assert tree['conv0']['u'].shape == (8,)
    assert 'weight_v' not in tree['conv0'] and 'v' not in tree['conv0']

    # end-to-end: a full torch-side SN state dict loads into the arch tree
    full_sd = {}
    for name, leaf in _torch_sn_names(net.params).items():
        full_sd[name] = torch.zeros(leaf)
    path = tmp_path / 'd.pth'
    torch.save({'params': full_sd}, path)
    net.load(str(path))
    import jax
    assert all(np.all(np.asarray(a) == 0) for a in jax.tree.leaves(net.params))


def _torch_sn_names(tree, prefix=''):
    """Enumerate the torch-side names/shapes for an SN-conv param tree."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_torch_sn_names(v, f'{prefix}{k}.'))
        elif k == 'w':
            h, w_, ci, co = v.shape
            out[f'{prefix}weight_orig'] = (co, ci, h, w_)
        elif k == 'u':
            out[f'{prefix}weight_u'] = tuple(v.shape)
        elif k == 'b':
            out[f'{prefix}bias'] = tuple(v.shape)
    return out


def test_npz_checkpoint_roundtrip_preserves_empty_subtrees(tmp_path):
    """norm='none'/'in' slots are paramless {} nodes in the arch pytree;
    the flat npz encoding must keep them (regression: a reloaded
    norm-free WNet crashed on p['inc']['n1'])."""
    from bsvd_tpu.models.checkpoint import (load_npz_params,
                                            save_npz_params)
    tree = {'inc': {'c1': {'w': np.ones((3, 3, 4, 8), np.float32),
                           'b': np.zeros((8,), np.float32)},
                    'n1': {}, 'n2': {}},
            'scalar': np.float32(2.0)}
    path = tmp_path / 'ck.npz'
    save_npz_params(str(path), {'params': tree, 'params_ema': tree})
    for key in ('params', 'params_ema'):
        got = load_npz_params(str(path), key)
        assert got['inc']['n1'] == {} and got['inc']['n2'] == {}
        np.testing.assert_array_equal(got['inc']['c1']['w'],
                                      tree['inc']['c1']['w'])
        assert got['scalar'] == 2.0
    import jax
    assert (jax.tree.structure(got) ==
            jax.tree.structure(jax.tree.map(np.asarray, tree)))
