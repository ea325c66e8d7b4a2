"""ctypes bindings for the native data-plane core (csrc/dataio.cpp).

Provides `tar_index(path)` — (name, offset, size) for every file in a tar
shard via one mmap pass — and `mds_sample_table(buf)` — the sample offset
table of an MDS shard. Both have pure-Python fallbacks so the framework runs
without the compiled library (build it with tools/build_native.py).
"""

from __future__ import annotations

import ctypes
import mmap
import os
import tarfile
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["tar_index", "mds_sample_table", "native_available",
           "jpeg_decode_square", "jpeg_native_available"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libdataio.so")
_lib = None


class _TarEntry(ctypes.Structure):
    _fields_ = [("name_off", ctypes.c_uint64), ("name_len", ctypes.c_uint32),
                ("data_off", ctypes.c_uint64), ("data_len", ctypes.c_uint64)]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tar_index.restype = ctypes.c_long
        lib.tar_index.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                  ctypes.POINTER(_TarEntry), ctypes.c_long]
        lib.mds_sample_table.restype = ctypes.c_int
        lib.mds_sample_table.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint32]
        lib.jpeg_decode_square.restype = ctypes.c_int
        lib.jpeg_decode_square.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def native_available() -> bool:
    return bool(_load())


def tar_index(path: str) -> List[Tuple[str, int, int]]:
    """[(member_name, data_offset, data_size)] for regular files in a tar."""
    lib = _load()
    if not lib:
        out = []
        with tarfile.open(path, "r") as tf:
            for m in tf:
                if m.isfile():
                    out.append((m.name, m.offset_data, m.size))
        return out
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        view = None
        try:
            # zero-copy readonly view; numpy exposes the buffer address
            view = np.frombuffer(mm, np.uint8)
            addr = view.ctypes.data
            # every entry consumes >= 512 header bytes, so this bounds them
            max_entries = len(mm) // 512 + 16
            entries = (_TarEntry * max_entries)()
            n = lib.tar_index(ctypes.cast(addr, ctypes.c_char_p), len(mm),
                              entries, max_entries)
            if n < 0:
                raise ValueError(f"malformed tar: {path}")
            out = []
            for i in range(n):
                e = entries[i]
                name = mm[e.name_off:e.name_off + e.name_len].decode(
                    "utf-8", errors="replace")
                out.append((name, int(e.data_off), int(e.data_len)))
            return out
        finally:
            del view  # release buffer export before closing the mmap
            mm.close()


_JPEG_MAGIC = b"\xff\xd8"


def jpeg_native_available() -> bool:
    """True when the compiled library can decode JPEGs (built with
    -DHAVE_JPEG against libjpeg/-turbo)."""
    lib = _load()
    if not lib:
        return False
    # a no-JPEG build stubs the symbol to return -100
    out = (ctypes.c_float * 3)()
    return lib.jpeg_decode_square(_JPEG_MAGIC, 2, 1, 1, out) != -100


def jpeg_decode_square(data: bytes, size: int,
                       min_short: Optional[int] = None) -> Optional[np.ndarray]:
    """Decode a JPEG and return the LargestCenterSquare crop resized to
    (size, size, 3) float32 in [-1, 1] — the whole SD train-input transform
    (reference datasets/laion/transforms.py:9-21 + Normalize(0.5, 0.5)) in
    one GIL-releasing native call. Returns None when the native path is
    unavailable or declines the stream (corrupt data, CMYK, non-JPEG):
    callers fall back to the tolerant PIL path.

    `min_short` is the smallest acceptable decoded short side for libjpeg
    DCT scaling (defaults to `size`; pass 2*size for PIL-draft-quality
    headroom)."""
    lib = _load()
    if not lib or not isinstance(data, (bytes, bytearray)) \
            or not bytes(data[:2]) == _JPEG_MAGIC:
        return None
    out = np.empty((size, size, 3), np.float32)
    rc = lib.jpeg_decode_square(
        bytes(data), len(data), size, int(min_short or size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def mds_sample_table(buf: bytes) -> Optional[np.ndarray]:
    """(n, 2) array of [start, end) byte ranges per sample, or None to use
    the Python path."""
    lib = _load()
    if not lib:
        return None
    n = int(np.frombuffer(buf[:4], np.uint32)[0])
    starts = (ctypes.c_uint64 * n)()
    ends = (ctypes.c_uint64 * n)()
    got = lib.mds_sample_table(buf, len(buf), starts, ends, n)
    if got < 0:
        raise ValueError("malformed MDS shard")
    out = np.empty((got, 2), np.int64)
    out[:, 0] = np.frombuffer(starts, np.uint64, got)
    out[:, 1] = np.frombuffer(ends, np.uint64, got)
    return out
