"""Storage backends for dataset IO (reference: BasicSR/basicsr/utils/file_client.py
disk / lmdb / memcached clients behind one FileClient facade)."""

from abc import ABCMeta, abstractmethod


class BaseStorageBackend(metaclass=ABCMeta):

    @abstractmethod
    def get(self, filepath):
        pass

    @abstractmethod
    def get_text(self, filepath):
        pass


class HardDiskBackend(BaseStorageBackend):

    def get(self, filepath):
        with open(str(filepath), 'rb') as f:
            return f.read()

    def get_text(self, filepath):
        with open(str(filepath), 'r') as f:
            return f.read()


class LmdbBackend(BaseStorageBackend):
    """LMDB backend (reads values by key from one or more lmdb envs).

    Prefers the real ``lmdb`` package; falls back to the API-compatible
    pure-Python store (bsvd_tpu/utils/_lmdb_compat.py) so lmdb-backed
    datasets created by our tooling work without liblmdb.
    """

    def __init__(self, db_paths, client_keys='default', readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError:
            from bsvd_tpu.utils import _lmdb_compat as lmdb
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, list):
            self.db_paths = [str(v) for v in db_paths]
        else:
            self.db_paths = [str(db_paths)]
        assert len(client_keys) == len(self.db_paths)
        self._client = {}
        for client, path in zip(client_keys, self.db_paths):
            self._client[client] = lmdb.open(path, readonly=readonly, lock=lock,
                                             readahead=readahead, **kwargs)

    def get(self, filepath, client_key='default'):
        assert client_key in self._client, f'client_key {client_key} not in lmdb clients'
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            value_buf = txn.get(str(filepath).encode('ascii'))
        return value_buf

    def get_text(self, filepath):
        raise NotImplementedError


class MemcachedBackend(BaseStorageBackend):
    """Memcached backend (reference file_client.py memcached branch, which
    binds the mmcv/pymc client).

    Implemented directly on the memcached TEXT protocol over a socket — no
    client package needed. ``server_list_cfg`` is either a ``host:port``
    string or a path to a file whose first non-comment line is
    ``host:port`` (the mmcv server-list format); ``client_cfg`` is accepted
    for signature parity and unused.
    """

    def __init__(self, server_list_cfg, client_cfg=None, sys_path=None):
        del client_cfg, sys_path
        import os
        addr = server_list_cfg
        if isinstance(addr, str) and os.path.exists(addr):
            with open(addr) as f:
                lines = [ln.strip() for ln in f
                         if ln.strip() and not ln.startswith('#')]
            addr = lines[0]
        host, _, port = str(addr).rpartition(':')
        self._addr = (host or 'localhost', int(port))
        self._sock = None

    def _connect(self):
        if self._sock is None:
            import socket
            self._sock = socket.create_connection(self._addr, timeout=10)
        return self._sock

    def _readline(self, sock):
        buf = b''
        while not buf.endswith(b'\r\n'):
            ch = sock.recv(1)
            if not ch:
                raise ConnectionError('memcached connection closed')
            buf += ch
        return buf[:-2]

    def get(self, filepath):
        key = str(filepath)
        if ' ' in key or '\r' in key or '\n' in key or len(key) > 250:
            raise ValueError(f'invalid memcached key: {key!r} (no '
                             'whitespace/control chars, max 250 bytes)')
        sock = self._connect()
        sock.sendall(f'get {key}\r\n'.encode())
        header = self._readline(sock)
        if header == b'END':
            return None
        parts = header.split()
        if not parts or parts[0] != b'VALUE' or len(parts) < 4:
            # ERROR / CLIENT_ERROR / SERVER_ERROR or garbage: surface it and
            # drop the (now desynchronized) connection
            self._sock.close()
            self._sock = None
            raise ConnectionError(
                f'memcached error for key {key!r}: {header.decode(errors="replace")}')
        nbytes = int(parts[3])
        data = b''
        while len(data) < nbytes:
            chunk = sock.recv(nbytes - len(data))
            if not chunk:
                raise ConnectionError('memcached connection closed mid-value')
            data += chunk
        assert self._readline(sock) == b''        # value trailer CRLF
        assert self._readline(sock) == b'END'
        return data

    def get_text(self, filepath):
        value = self.get(filepath)
        return None if value is None else value.decode()


class FileClient:
    """Facade dispatching to a storage backend by name."""

    _backends = {
        'disk': HardDiskBackend,
        'lmdb': LmdbBackend,
        'memcached': MemcachedBackend,
    }

    def __init__(self, backend='disk', **kwargs):
        if backend not in self._backends:
            raise ValueError(f'Backend {backend} is not supported. '
                             f'Currently supported ones are {list(self._backends)}')
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key='default'):
        if self.backend == 'lmdb':
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath):
        return self.client.get_text(filepath)
