"""File clients (reference BasicSR/basicsr/utils/file_client.py:33-167):
disk / packed (native OGIPack, replacing lmdb) / lmdb (when the package is
present) behind one `get(key) -> bytes` interface."""

import os.path as osp

from ..runtime.packio import PackReader


class DiskBackend:
    def get(self, filepath):
        with open(filepath, "rb") as f:
            return f.read()


class PackedBackend:
    """OGIPack-backed storage; keys are the packed names (or indices)."""

    def __init__(self, db_path, native=True):
        self.reader = PackReader(db_path, native=native)
        self._by_name = {self.reader.name(i): i
                         for i in range(len(self.reader))}

    def keys(self):
        return list(self._by_name)

    def get(self, key):
        if isinstance(key, int):
            return self.reader.read(key)
        return self.reader.read(self._by_name[key])


class LmdbBackend:
    def __init__(self, db_path, **kwargs):
        import lmdb
        self.env = lmdb.open(db_path, readonly=True, lock=False,
                             readahead=False, **kwargs)

    def get(self, key):
        with self.env.begin(write=False) as txn:
            return txn.get(key.encode("ascii"))


class MemcachedBackend:
    """Memcached-backed storage (reference file_client.py:22-56): keys are
    file paths served by a pre-loaded memcached cluster. The `mc` client
    library is cluster-infrastructure-specific and not installable here, so
    the backend is a lazy-import gate (exactly the reference's behavior when
    `import mc` fails); no shipped config uses it."""

    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        if sys_path is not None:
            import sys
            sys.path.append(sys_path)
        try:
            import mc
        except ImportError:
            raise ImportError(
                "memcached backend needs the `mc` client library "
                "(reference file_client.py:36-39)")
        self._client = mc.MemcachedClient.GetInstance(server_list_cfg,
                                                      client_cfg)
        self._mc_buffer = mc.pyvector()

    def get(self, filepath):
        import mc
        self._client.Get(filepath, self._mc_buffer)
        return mc.ConvertBuffer(self._mc_buffer)


class FileClient:
    BACKENDS = {"disk": DiskBackend, "packed": PackedBackend,
                "lmdb": LmdbBackend, "memcached": MemcachedBackend}

    def __init__(self, backend="disk", **kwargs):
        if backend not in self.BACKENDS:
            raise ValueError(f"backend {backend} not in {list(self.BACKENDS)}")
        self.backend = self.BACKENDS[backend](**kwargs)

    def get(self, key):
        return self.backend.get(key)
