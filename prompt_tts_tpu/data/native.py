"""ctypes bindings for the native data-loading core (native/ptts_io.cpp).

The shared library is built on demand with g++ (pybind11 is not available
in the target image; the C ABI + ctypes keeps the binding dependency-free).
Every entry point has a numpy fallback, so the loader works — just slower —
when no compiler is present.
"""

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SRC = os.path.join(_REPO_NATIVE, "ptts_io.cpp")
_LIB_PATH = os.path.join(_REPO_NATIVE, "libptts_io.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


class _TarEntry(ctypes.Structure):
    _fields_ = [
        ("name", ctypes.c_char * 256),
        ("offset", ctypes.c_uint64),
        ("size", ctypes.c_uint64),
    ]


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-pthread", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable (numpy fallbacks are used instead)."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.ptts_tar_index.restype = ctypes.c_int64
        lib.ptts_tar_index.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(_TarEntry), ctypes.c_int64]
        lib.ptts_read_at.restype = ctypes.c_int
        lib.ptts_read_at.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.ptts_npy_to_i16.restype = ctypes.c_int
        lib.ptts_npy_to_i16.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.ptts_collate_codes.restype = None
        lib.ptts_collate_codes.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.ptts_pcm16_to_f32.restype = None
        lib.ptts_pcm16_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def tar_index(path: str, max_entries: int = 1 << 20) -> List[Tuple[str, int, int]]:
    """[(member_name, payload_offset, size)] for a plain tar file."""
    lib = get_lib()
    if lib is None:
        return _tar_index_py(path)
    entries = (_TarEntry * max_entries)()
    n = lib.ptts_tar_index(path.encode(), entries, max_entries)
    if n < 0:
        raise IOError(f"cannot index tar {path}")
    return [(entries[i].name.decode(), entries[i].offset, entries[i].size)
            for i in range(n)]


def _tar_index_py(path: str) -> List[Tuple[str, int, int]]:
    import tarfile
    out = []
    with tarfile.open(path, "r:") as tf:
        for m in tf.getmembers():
            if m.isfile():
                out.append((m.name, m.offset_data, m.size))
    return out


def read_at(path: str, offset: int, size: int) -> bytes:
    lib = get_lib()
    if lib is None:
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(size)
    buf = (ctypes.c_uint8 * size)()
    rc = lib.ptts_read_at(path.encode(), offset, size, buf)
    if rc != 0:
        raise IOError(f"read_at failed rc={rc}")
    return bytes(buf)


def npy_to_i16(buf: bytes) -> np.ndarray:
    """Parse an integer [n_q, T] .npy buffer into an int16 array."""
    lib = get_lib()
    if lib is None:
        import io
        arr = np.load(io.BytesIO(buf))
        return arr.astype(np.int16)
    # worst case: all payload is int16 data
    out = np.empty(len(buf) // 2 + 16, np.int16)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    src = (ctypes.c_uint8 * len(buf)).from_buffer_copy(buf)
    rc = lib.ptts_npy_to_i16(
        src, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise ValueError(f"npy parse failed rc={rc}")
    return out[: rows.value * cols.value].reshape(rows.value, cols.value).copy()


def collate_codes(codes: np.ndarray) -> np.ndarray:
    """int16 ``[B, n_q, T]`` -> float32 latents ``[B, T, n_q]`` in [-1, 1]."""
    codes = np.ascontiguousarray(codes, np.int16)
    B, n_q, T = codes.shape
    lib = get_lib()
    if lib is None:
        out = codes.astype(np.float32) * (2.0 / 1023.0) - 1.0
        return np.ascontiguousarray(out.transpose(0, 2, 1))
    out = np.empty((B, T, n_q), np.float32)
    lib.ptts_collate_codes(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        B, n_q, T,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
