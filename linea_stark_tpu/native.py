"""ctypes bindings for the native fastcodec library (native/fastcodec.c).

Accelerates the host-side byte<->field codec ~1000x over the pure-Python
path for zkevm-scale trace files.  Falls back silently if no C compiler is
available; codec.py picks this up when present.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys

    sys.path.insert(0, os.path.join(here, "native"))
    try:
        from build import build  # type: ignore

        so_path = build()
        lib = ctypes.CDLL(so_path)
    except Exception:
        _LIB = False
        return False
    lib.fr_decode_be_mod_order_mont.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_size_t,
        ctypes.c_int,
    ]
    lib.fr_encode_be.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t,
        ctypes.c_int,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not False


def decode_be_mod_order(data: np.ndarray, mont: bool = True) -> np.ndarray:
    """(N, 32) uint8 BE scalars -> (16, N) uint32 limb planes."""
    lib = _load()
    assert lib is not False
    a = np.ascontiguousarray(data, dtype=np.uint8)
    n = a.shape[0]
    out = np.empty((16, n), dtype=np.uint32)
    lib.fr_decode_be_mod_order_mont(
        a.tobytes(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n,
        1 if mont else 0,
    )
    return out


def encode_be(limbs: np.ndarray, mont: bool = True) -> np.ndarray:
    """(16, N) uint32 limb planes -> (N, 32) uint8 BE canonical scalars."""
    lib = _load()
    assert lib is not False
    a = np.ascontiguousarray(limbs, dtype=np.uint32)
    n = a.shape[1]
    out = np.empty((n, 32), dtype=np.uint8)
    lib.fr_encode_be(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        1 if mont else 0,
    )
    return out
