"""Pure-Python fallback for the ``lmdb`` package's small API subset this
framework uses (reference BasicSR depends on the real lmdb:
utils/lmdb_util.py + the FileClient lmdb backend).

When the real ``lmdb`` package is importable it is always preferred (see
the import sites in lmdb_util.py / file_client.py); this module only makes
the lmdb *pipeline* runnable in environments without liblmdb. The on-disk
format is NOT the LMDB B-tree — it is a simple append-only record log::

    <dir>.lmdb/data.mdb = [u32 klen][key][u64 vlen][value] ...

plus the same ``meta_info.txt`` the BasicSR layout carries, so datasets,
``paths_from_lmdb`` and the create-lmdb tooling behave identically. A real
LMDB file cannot be opened with this shim (and vice versa); ``open``
raises a clear error on a format mismatch.
"""

import io
import os
import struct
import threading

_MAGIC = b'BSVDKV01'


class _Txn:
    """Transaction: buffered puts, direct reads. Usable as a context
    manager for the read pattern ``with env.begin(write=False) as txn``."""

    def __init__(self, env, write):
        self._env = env
        self._write = write
        self._pending = []

    def put(self, key, value):
        assert self._write, 'read-only transaction'
        self._pending.append((bytes(key), bytes(value)))
        return True

    def get(self, key):
        return self._env._get(bytes(key))

    def commit(self):
        if self._write and self._pending:
            self._env._append(self._pending)
            self._pending = []

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.commit()
        return False


class Environment:
    def __init__(self, path, readonly=False):
        self.path = path
        self.readonly = readonly
        self._lock = threading.Lock()
        self._data_path = os.path.join(path, 'data.mdb')
        self._index = {}
        if os.path.exists(self._data_path):
            self._load_index()
        elif readonly:
            # do NOT create the directory for a readonly open of a missing
            # database (matching real lmdb's behavior)
            raise FileNotFoundError(f'no data.mdb under {path}')
        else:
            os.makedirs(path, exist_ok=True)
            with io.open(self._data_path, 'wb') as f:
                f.write(_MAGIC)

    def _load_index(self):
        with io.open(self._data_path, 'rb') as f:
            magic = f.read(len(_MAGIC))
            if magic != _MAGIC:
                raise ValueError(
                    f'{self._data_path} is not a bsvd-kv log (a real LMDB '
                    'file? install the lmdb package to read it)')
            while True:
                hdr = f.read(4)
                if len(hdr) < 4:
                    break
                klen = struct.unpack('<I', hdr)[0]
                key = f.read(klen)
                vlen = struct.unpack('<Q', f.read(8))[0]
                off = f.tell()
                f.seek(vlen, os.SEEK_CUR)
                self._index[key] = (off, vlen)

    def _append(self, items):
        with self._lock, io.open(self._data_path, 'ab') as f:
            for key, value in items:
                f.write(struct.pack('<I', len(key)))
                f.write(key)
                f.write(struct.pack('<Q', len(value)))
                off = f.tell()
                f.write(value)
                self._index[key] = (off, len(value))

    def _get(self, key):
        entry = self._index.get(key)
        if entry is None:
            return None
        off, vlen = entry
        with self._lock, io.open(self._data_path, 'rb') as f:
            f.seek(off)
            return f.read(vlen)

    def begin(self, write=False):
        if write and self.readonly:
            raise PermissionError('environment opened readonly')
        return _Txn(self, write)

    def stat(self):
        return {'entries': len(self._index)}

    def close(self):
        pass


def open(path, map_size=None, readonly=False, lock=False, readahead=False,
         **kwargs):  # noqa: A001 - mirrors the lmdb package API
    del map_size, lock, readahead, kwargs
    return Environment(path, readonly=readonly)
