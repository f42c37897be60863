"""Storage backend abstraction (ref: basicsr/utils/file_client.py:22-167).

Backends: disk (default), rawpack (this framework's native decode-free
packed format — the LMDB replacement), and gated lmdb/memcached (the
python bindings are not installed in this environment; constructing them
raises with instructions instead of failing at first read).
"""

from __future__ import annotations

from typing import Any, Dict


class DiskBackend:
    def get(self, filepath: str, client_key: str | None = None) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()

    def get_text(self, filepath: str) -> str:
        with open(filepath, "r") as f:
            return f.read()


class RawPackBackend:
    """Reads whole items from RawPack files by integer key or 'name' via an
    optional meta listing."""

    def __init__(self, db_paths, client_keys="default"):
        from super_resolution_tpu.data.rawpack_dataset import RawPackReader

        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        self._readers = {k: RawPackReader(p)
                         for k, p in zip(client_keys, db_paths)}

    def get(self, idx, client_key: str = "default"):
        return self._readers[client_key].read(int(idx))


class LmdbBackend:
    """Multi-env lmdb reader keyed by client (ref: file_client.py:74-131)."""

    def __init__(self, db_paths, client_keys="default", readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                "lmdb is not installed in this environment. Use the "
                "'rawpack' backend (native decode-free packed datasets, "
                "data/rawpack_dataset.py) or install python-lmdb.") from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, (list, tuple)):
            db_paths = [str(v) for v in db_paths]
        else:
            db_paths = [str(db_paths)]
        assert len(client_keys) == len(db_paths)
        self._client = {k: lmdb.open(p, readonly=readonly, lock=lock,
                                     readahead=readahead, **kwargs)
                        for k, p in zip(client_keys, db_paths)}

    def get(self, filepath, client_key="default"):
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))


class MemcachedBackend:
    def __init__(self, *args, **kwargs):
        raise ImportError("memcached backend requires pymemcache/mc; use "
                          "'disk' or 'rawpack'")


class FileClient:
    """Dispatch by backend name (ref: file_client.py:132-167)."""

    _backends = {
        "disk": DiskBackend,
        "rawpack": RawPackBackend,
        "lmdb": LmdbBackend,
        "memcached": MemcachedBackend,
    }

    def __init__(self, backend: str = "disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(f"Backend {backend} not supported. "
                             f"Available: {sorted(self._backends)}")
        self.backend = backend
        self.client = self._backends[backend](**kwargs) if kwargs else \
            self._backends[backend]()

    def get(self, filepath, client_key: str | None = None):
        if self.backend == "rawpack":
            return self.client.get(filepath, client_key or "default")
        return self.client.get(filepath)

    def get_text(self, filepath):
        return self.client.get_text(filepath)
