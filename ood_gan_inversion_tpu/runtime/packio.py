"""OGIPack: packed-blob dataset (writer + reader).

The reader prefers the native mmap .so (packio.cpp, built on demand with
g++); a pure-Python reader with identical semantics is the fallback and the
reference implementation for tests. See packio.cpp for the format.
"""

import ctypes
import os
import os.path as osp
import struct
import subprocess

MAGIC = b"OGIPACK1"
_LIB = None
_LIB_TRIED = False


def _so_path():
    return osp.join(osp.dirname(osp.abspath(__file__)), "libpackio.so")


def build_native(force=False):
    """Compile packio.cpp -> libpackio.so (g++, no external deps)."""
    src = osp.join(osp.dirname(osp.abspath(__file__)), "packio.cpp")
    out = _so_path()
    if osp.exists(out) and not force and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                    "-o", out, src], check=True)
    return out


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        lib = ctypes.CDLL(build_native())
        lib.ogipack_open.restype = ctypes.c_void_p
        lib.ogipack_open.argtypes = [ctypes.c_char_p]
        lib.ogipack_count.restype = ctypes.c_long
        lib.ogipack_count.argtypes = [ctypes.c_void_p]
        lib.ogipack_blob_size.restype = ctypes.c_long
        lib.ogipack_blob_size.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.ogipack_name_len.restype = ctypes.c_long
        lib.ogipack_name_len.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.ogipack_name.restype = ctypes.c_long
        lib.ogipack_name.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                     ctypes.c_char_p, ctypes.c_long]
        lib.ogipack_read.restype = ctypes.c_long
        lib.ogipack_read.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                     ctypes.POINTER(ctypes.c_ubyte),
                                     ctypes.c_long]
        lib.ogipack_prefetch.restype = None
        lib.ogipack_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.ogipack_close.restype = None
        lib.ogipack_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def write_pack(out_path, items):
    """items: iterable of (name, bytes). Writes the OGIPACK1 file."""
    entries = []
    with open(out_path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<QQ", 0, 0))  # placeholders
        for name, blob in items:
            entries.append((f.tell(), len(blob), name))
            f.write(blob)
        index_offset = f.tell()
        for off, size, name in entries:
            nb = name.encode("utf-8")
            f.write(struct.pack("<QQI", off, size, len(nb)))
            f.write(nb)
        f.seek(len(MAGIC))
        f.write(struct.pack("<QQ", len(entries), index_offset))
    return len(entries)


class PackReader:
    """Unified reader: native mmap .so when available, else pure Python."""

    def __init__(self, path, native=True):
        self.path = path
        self._h = None
        self._lib = _load_native() if native else None
        if self._lib is not None:
            self._h = self._lib.ogipack_open(path.encode())
            if not self._h:
                self._lib = None
        if self._lib is None:
            self._open_py(path)

    # -------------------------------------------------- pure-python fallback
    def _open_py(self, path):
        self._f = open(path, "rb")
        header = self._f.read(24)
        assert header[:8] == MAGIC, f"not an OGIPACK file: {path}"
        count, index_offset = struct.unpack("<QQ", header[8:24])
        self._f.seek(index_offset)
        self._entries = []
        for _ in range(count):
            off, size, nl = struct.unpack("<QQI", self._f.read(20))
            name = self._f.read(nl).decode("utf-8")
            self._entries.append((off, size, name))

    # ------------------------------------------------------------- interface
    @property
    def native(self):
        return self._lib is not None

    def __len__(self):
        if self._lib is not None:
            return self._lib.ogipack_count(self._h)
        return len(self._entries)

    def name(self, idx):
        if self._lib is not None:
            n = self._lib.ogipack_name_len(self._h, idx)
            buf = ctypes.create_string_buffer(n)
            self._lib.ogipack_name(self._h, idx,
                                   ctypes.cast(buf, ctypes.c_char_p), n)
            return buf.raw.decode("utf-8")
        return self._entries[idx][2]

    def read(self, idx) -> bytes:
        if self._lib is not None:
            n = self._lib.ogipack_blob_size(self._h, idx)
            buf = (ctypes.c_ubyte * n)()
            k = self._lib.ogipack_read(self._h, idx, buf, n)
            assert k == n
            return bytes(buf)
        off, size, _ = self._entries[idx]
        self._f.seek(off)
        return self._f.read(size)

    def prefetch(self, idx):
        if self._lib is not None:
            self._lib.ogipack_prefetch(self._h, idx)

    def close(self):
        if self._lib is not None and self._h:
            self._lib.ogipack_close(self._h)
            self._h = None
        elif getattr(self, "_f", None):
            self._f.close()
