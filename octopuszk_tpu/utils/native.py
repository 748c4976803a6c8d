"""ctypes bridge to the native marshaling library (native/marshal.c).

Loads ``native/libmarshal.so`` if present (``make -C native``); callers
fall back to pure-numpy paths when unavailable.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "libmarshal.so")


def lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        path = _find()
        if os.path.exists(path):
            L = ctypes.CDLL(path)
            L.bytes_to_limbs.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32)]
            L.limbs_to_bytes.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_char_p]
            _LIB = L
    return _LIB


def available() -> bool:
    return lib() is not None


def bytes_to_limbs(raw: bytes, n: int, nbytes: int,
                   num_limbs: int) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    out = np.empty((num_limbs, n), dtype=np.uint32)
    L.bytes_to_limbs(raw, n, nbytes, num_limbs,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


def limbs_to_bytes(limbs: np.ndarray) -> bytes | None:
    L = lib()
    if L is None:
        return None
    num_limbs, n = limbs.shape
    arr = np.ascontiguousarray(limbs, dtype=np.uint32)
    out = ctypes.create_string_buffer(int(n) * int(num_limbs) * 2)
    L.limbs_to_bytes(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                     n, num_limbs, out)
    return out.raw
