"""ctypes wrapper for the native zip reading core (zipreader.cpp).

Builds libzipio.so on first use (g++ + zlib, both baked into the image) and
exposes:

  NativeZip(path)        — central directory parsed once; .read(name),
                           .namelist(), .exists(name), .size(name)
  read_many(pairs, ...)  — batch read [(path, member), ...] on a C++ thread
                           pool, fully GIL-free (one call per training batch)
  have_native()          — False when the toolchain is unavailable; callers
                           fall back to Python zipfile

Replaces the per-read zipfile.ZipFile pattern of the reference loader
(reference ca_code/utils/dataloader.py:252-298).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "zipreader.cpp"
_SO = _HERE / "libzipio.so"

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return ctypes.CDLL(str(_SO))
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
             "-o", str(_SO), "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return ctypes.CDLL(str(_SO))
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.gz_open.argtypes = [ctypes.c_char_p]
                lib.gz_open.restype = ctypes.c_int64
                lib.gz_close.argtypes = [ctypes.c_int64]
                lib.gz_num_entries.argtypes = [ctypes.c_int64]
                lib.gz_num_entries.restype = ctypes.c_int64
                lib.gz_entry_name.argtypes = [ctypes.c_int64, ctypes.c_int64]
                lib.gz_entry_name.restype = ctypes.c_char_p
                lib.gz_entry_size.argtypes = [ctypes.c_int64, ctypes.c_char_p]
                lib.gz_entry_size.restype = ctypes.c_int64
                lib.gz_read.argtypes = [
                    ctypes.c_int64, ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
                lib.gz_read.restype = ctypes.c_int64
                lib.gz_read_many.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64, ctypes.c_int64]
                lib.gz_read_many.restype = ctypes.c_int64
            _lib = lib
    return _lib


def have_native() -> bool:
    return _get_lib() is not None


class NativeZip:
    """One parsed zip archive; thread-safe reads via pread."""

    def __init__(self, path: str | os.PathLike):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native zip core unavailable")
        self._lib = lib
        self._h = lib.gz_open(str(path).encode())
        if self._h < 0:
            raise OSError(f"cannot open zip: {path} (rc={self._h})")
        self.path = str(path)

    def namelist(self) -> List[str]:
        n = self._lib.gz_num_entries(self._h)
        return [self._lib.gz_entry_name(self._h, i).decode()
                for i in range(n)]

    def exists(self, name: str) -> bool:
        return self._lib.gz_entry_size(self._h, name.encode()) >= 0

    def size(self, name: str) -> int:
        s = self._lib.gz_entry_size(self._h, name.encode())
        if s < 0:
            raise KeyError(name)
        return int(s)

    def read(self, name: str) -> bytes:
        sz = self.size(name)
        buf = (ctypes.c_uint8 * sz)()
        r = self._lib.gz_read(self._h, name.encode(), buf, sz)
        if r < 0:
            raise OSError(f"zip read failed ({r}): {name} in {self.path}")
        return bytes(bytearray(buf)[: int(r)])

    def close(self):
        if self._h >= 0:
            self._lib.gz_close(self._h)
            self._h = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


_open_cache: dict = {}
_open_lock = threading.Lock()


def open_cached(path: str | os.PathLike) -> NativeZip:
    key = str(path)
    with _open_lock:
        z = _open_cache.get(key)
        if z is None:
            z = NativeZip(key)
            _open_cache[key] = z
        return z


def read_many(
    pairs: Sequence[Tuple[str, str]], nthreads: int = 8,
) -> List[Optional[bytes]]:
    """Batch read [(zip_path, member), ...] on the C++ thread pool.

    Returns one bytes (or None for a missing/corrupt member) per pair.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native zip core unavailable")
    n = len(pairs)
    if n == 0:
        return []
    zips = [open_cached(p) for p, _ in pairs]
    handles = (ctypes.c_int64 * n)(*[z._h for z in zips])
    names = (ctypes.c_char_p * n)(*[m.encode() for _, m in pairs])
    caps_list = []
    bufs = []
    for z, (_, m) in zip(zips, pairs):
        s = lib.gz_entry_size(z._h, m.encode())
        s = max(int(s), 0)
        caps_list.append(s)
        bufs.append((ctypes.c_uint8 * s)())
    caps = (ctypes.c_int64 * n)(*caps_list)
    outs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[ctypes.cast(b, ctypes.POINTER(ctypes.c_uint8)) for b in bufs])
    sizes = (ctypes.c_int64 * n)()
    lib.gz_read_many(handles, names, outs, caps, sizes, n, nthreads)
    return [bytes(bytearray(b)[: int(s)]) if s >= 0 else None
            for b, s in zip(bufs, sizes)]
