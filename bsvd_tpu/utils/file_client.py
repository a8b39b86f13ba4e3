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

    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        raise NotImplementedError('memcached backend is not available in this '
                                  'environment')

    def get(self, filepath):
        raise NotImplementedError

    def get_text(self, filepath):
        raise NotImplementedError


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
