"""ctypes bindings for the native host engine (native/fasthash.c).

Batch Fr arithmetic + Poseidon2 sweeps on the host CPU.  Used by the
host-side subsystems where remote-device dispatch latency exceeds the
compute: the verifier's Merkle-path sweep (reference verifies in 944 ms,
bench.log:69), the FRI tail fold/commit levels, and batch inversions of
host-resident vectors.  Falls back (see hash/np_poseidon2.py) to numpy
object arrays when no C compiler is available.

Value layout at the ABI: ``(n, 4)`` uint64 little-endian limb rows holding
canonical (non-Montgomery) residues mod r.
"""

from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

from ..field.constants import R_MOD
from .poseidon2 import Poseidon2Params

_LIB = None
_U64P = ctypes.POINTER(ctypes.c_uint64)
_U32P = ctypes.POINTER(ctypes.c_uint32)


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import sys

    native_dir = os.path.join(here, "native")
    if native_dir not in sys.path:
        sys.path.insert(0, native_dir)
    try:
        from build import build_fasthash  # type: ignore

        lib = ctypes.CDLL(build_fasthash())
    except Exception:
        _LIB = False
        return False
    for name, argtypes in (
        ("fr_mul_batch", [_U64P, _U64P, _U64P, ctypes.c_size_t]),
        ("fr_add_batch", [_U64P, _U64P, _U64P, ctypes.c_size_t]),
        ("fr_sub_batch", [_U64P, _U64P, _U64P, ctypes.c_size_t]),
        ("fr_powers", [_U64P, _U64P, ctypes.c_size_t]),
        ("fr_from_mont_batch", [_U64P, _U64P, ctypes.c_size_t]),
        ("fr_to_mont_batch", [_U64P, _U64P, ctypes.c_size_t]),
        ("fr_inv_batch", [_U64P, _U64P, ctypes.c_size_t]),
        ("fr_fold", [_U64P, ctypes.c_size_t, _U64P, _U64P, _U64P, _U64P]),
        ("p2_permute_batch",
         [_U64P, ctypes.c_int, ctypes.c_int, _U64P, _U64P, _U64P,
          ctypes.c_size_t]),
        ("p2_compress_batch",
         [_U64P, ctypes.c_int, ctypes.c_int, _U64P, _U64P, _U64P,
          ctypes.c_size_t]),
        ("p2_hash_columns",
         [_U64P, ctypes.c_int, ctypes.c_int, _U64P, ctypes.c_size_t,
          ctypes.c_size_t, _U64P]),
        ("p2_tree_levels",
         [_U64P, ctypes.c_int, ctypes.c_int, _U64P, ctypes.c_size_t, _U64P]),
        ("p2_merkle_roots",
         [_U64P, ctypes.c_int, ctypes.c_int, _U64P, _U64P, _U64P, _U32P,
          ctypes.c_size_t, ctypes.c_size_t]),
        ("kc_hash_columns", [_U64P, ctypes.c_size_t, ctypes.c_size_t, _U64P]),
        ("kc_compress_batch", [_U64P, _U64P, _U64P, ctypes.c_size_t]),
        ("kc_tree_levels", [_U64P, ctypes.c_size_t, _U64P]),
        ("kc_merkle_roots",
         [_U64P, _U64P, _U64P, _U32P, ctypes.c_size_t, ctypes.c_size_t]),
    ):
        getattr(lib, name).argtypes = argtypes
    _LIB = lib
    return lib


def available() -> bool:
    if os.environ.get("LINEA_NO_NATIVE"):
        return False
    return _load() is not False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_U64P)


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1


def ints_to_u64(vals) -> np.ndarray:
    """Iterable of canonical ints -> (n, 4) uint64 LE limb rows."""
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype=np.uint64).reshape(-1, 4).copy()


def u64_to_ints(arr: np.ndarray) -> list:
    data = np.ascontiguousarray(arr, dtype=np.uint64).tobytes()
    return [
        int.from_bytes(data[32 * i : 32 * i + 32], "little")
        for i in range(len(data) // 32)
    ]


def obj_to_u64(arr: np.ndarray) -> np.ndarray:
    return ints_to_u64(arr.tolist())


def u64_to_obj(arr: np.ndarray) -> np.ndarray:
    return np.array(u64_to_ints(arr), dtype=object)


def planes_to_u64(planes: np.ndarray) -> np.ndarray:
    """(16, n) uint32 16-bit limb planes -> (n, 4) uint64 rows (pure numpy)."""
    p = planes.astype(np.uint64)
    out = np.empty((planes.shape[1], 4), dtype=np.uint64)
    for w in range(4):
        out[:, w] = (
            p[4 * w]
            | (p[4 * w + 1] << np.uint64(16))
            | (p[4 * w + 2] << np.uint64(32))
            | (p[4 * w + 3] << np.uint64(48))
        )
    return out


def u64_to_planes(arr: np.ndarray) -> np.ndarray:
    """(n, 4) uint64 rows -> (16, n) uint32 16-bit limb planes."""
    out = np.empty((16, arr.shape[0]), dtype=np.uint32)
    mask = np.uint64(0xFFFF)
    for i in range(16):
        out[i] = ((arr[:, i // 4] >> np.uint64(16 * (i % 4))) & mask).astype(
            np.uint32
        )
    return out


@functools.lru_cache(maxsize=8)
def _consts(params: Poseidon2Params) -> np.ndarray:
    """Canonical (rf+rp, 3, 4) u64 schedule in the kernel's row order."""
    rows = []
    for rc in params.external_constants(0):
        rows.append(list(rc))
    for c in params.internal_constants():
        rows.append([c, 0, 0])
    for rc in params.external_constants(1):
        rows.append(list(rc))
    flat = [c for row in rows for c in row]
    return ints_to_u64(flat)


# ---------------------------------------------------------------------------
# Field batch ops ((n, 4) u64 canonical in/out)
# ---------------------------------------------------------------------------

def mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.empty_like(a)
    lib.fr_mul_batch(_ptr(a), _ptr(b), _ptr(out), a.shape[0])
    return out


def add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.empty_like(a)
    lib.fr_add_batch(_ptr(a), _ptr(b), _ptr(out), a.shape[0])
    return out


def sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.empty_like(a)
    lib.fr_sub_batch(_ptr(a), _ptr(b), _ptr(out), a.shape[0])
    return out


def powers(base: int, count: int) -> np.ndarray:
    lib = _load()
    b = ints_to_u64([base % R_MOD])
    out = np.empty((count, 4), dtype=np.uint64)
    lib.fr_powers(_ptr(b), _ptr(out), count)
    return out


def from_mont(a: np.ndarray) -> np.ndarray:
    """Montgomery (n, 4) rows (e.g. from planes_to_u64 of a device array)
    -> canonical rows."""
    lib = _load()
    out = np.empty_like(a)
    lib.fr_from_mont_batch(_ptr(np.ascontiguousarray(a)), _ptr(out), a.shape[0])
    return out


def to_mont(a: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.empty_like(a)
    lib.fr_to_mont_batch(_ptr(np.ascontiguousarray(a)), _ptr(out), a.shape[0])
    return out


def inv(a: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.empty_like(a)
    lib.fr_inv_batch(_ptr(a), _ptr(out), a.shape[0])
    return out


def fold(f: np.ndarray, beta: int, shift: int, omega: int) -> np.ndarray:
    """One arity-2 FRI fold of a canonical (n, 4) codeword, natural order."""
    lib = _load()
    n = f.shape[0]
    half = n // 2
    inv2 = pow(2, R_MOD - 2, R_MOD)
    # inv2x[i] = 1/(2·shift·omega^i) = inv2·inv_shift·inv_omega^i
    inv_shift = pow(shift, R_MOD - 2, R_MOD)
    inv_omega = pow(omega, R_MOD - 2, R_MOD)
    t = powers(inv_omega, half)
    c = ints_to_u64([(inv2 * inv_shift) % R_MOD])
    inv2x = mul(t, np.broadcast_to(c, t.shape).copy())
    out = np.empty((half, 4), dtype=np.uint64)
    lib.fr_fold(
        _ptr(np.ascontiguousarray(f)), n,
        _ptr(ints_to_u64([beta % R_MOD])),
        _ptr(ints_to_u64([inv2])),
        _ptr(inv2x), _ptr(out),
    )
    return out


# ---------------------------------------------------------------------------
# Poseidon2 sweeps
# ---------------------------------------------------------------------------

def permute(s0, s1, s2, params: Poseidon2Params):
    lib = _load()
    c = _consts(params)
    a = np.ascontiguousarray(s0).copy()
    b = np.ascontiguousarray(s1).copy()
    d = np.ascontiguousarray(s2).copy()
    lib.p2_permute_batch(
        _ptr(c), params.rounds_f, params.rounds_p,
        _ptr(a), _ptr(b), _ptr(d), a.shape[0],
    )
    return a, b, d


def compress(a: np.ndarray, b: np.ndarray, params: Poseidon2Params) -> np.ndarray:
    lib = _load()
    c = _consts(params)
    out = np.empty_like(a)
    lib.p2_compress_batch(
        _ptr(c), params.rounds_f, params.rounds_p,
        _ptr(np.ascontiguousarray(a)), _ptr(np.ascontiguousarray(b)),
        _ptr(out), a.shape[0],
    )
    return out


def hash_columns(cols: np.ndarray, params: Poseidon2Params) -> np.ndarray:
    """cols: (w, n, 4) canonical -> (n, 4) sponge digests."""
    lib = _load()
    c = _consts(params)
    w, n = cols.shape[0], cols.shape[1]
    out = np.empty((n, 4), dtype=np.uint64)
    lib.p2_hash_columns(
        _ptr(c), params.rounds_f, params.rounds_p,
        _ptr(np.ascontiguousarray(cols)), w, n, _ptr(out),
    )
    return out


def tree_levels(leaves: np.ndarray, params: Poseidon2Params) -> list:
    """All digest levels above (n, 4) leaves -> [(n/2, 4), ..., (1, 4)]."""
    lib = _load()
    c = _consts(params)
    n = leaves.shape[0]
    packed = np.empty((n - 1, 4), dtype=np.uint64)
    lib.p2_tree_levels(
        _ptr(c), params.rounds_f, params.rounds_p,
        _ptr(np.ascontiguousarray(leaves)), n, _ptr(packed),
    )
    levels = []
    off, size = 0, n
    while size > 1:
        size //= 2
        levels.append(packed[off : off + size])
        off += size
    return levels


# ---------------------------------------------------------------------------
# Keccak-256 sweeps (field-element digests; hash/keccak.py semantics)
# ---------------------------------------------------------------------------

def kc_hash_columns(cols: np.ndarray) -> np.ndarray:
    """cols: (w, n, 4) canonical -> (n, 4) keccak field digests."""
    lib = _load()
    w, n = cols.shape[0], cols.shape[1]
    out = np.empty((n, 4), dtype=np.uint64)
    lib.kc_hash_columns(_ptr(np.ascontiguousarray(cols)), w, n, _ptr(out))
    return out


def kc_compress(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.empty_like(a)
    lib.kc_compress_batch(
        _ptr(np.ascontiguousarray(a)), _ptr(np.ascontiguousarray(b)),
        _ptr(out), a.shape[0],
    )
    return out


def kc_tree_levels(leaves: np.ndarray) -> list:
    """All digest levels above (n, 4) leaves -> [(n/2, 4), ..., (1, 4)]."""
    lib = _load()
    n = leaves.shape[0]
    packed = np.empty((n - 1, 4), dtype=np.uint64)
    lib.kc_tree_levels(_ptr(np.ascontiguousarray(leaves)), n, _ptr(packed))
    levels = []
    off, size = 0, n
    while size > 1:
        size //= 2
        levels.append(packed[off : off + size])
        off += size
    return levels


def kc_merkle_roots(
    digests: np.ndarray,
    sibs: np.ndarray,
    parity_mask: np.ndarray,
    lens: np.ndarray,
) -> np.ndarray:
    """Keccak twin of :func:`merkle_roots` (same ABI minus constants)."""
    lib = _load()
    d = np.ascontiguousarray(digests).copy()
    q, max_len = sibs.shape[0], sibs.shape[1]
    lib.kc_merkle_roots(
        _ptr(d), _ptr(np.ascontiguousarray(sibs)),
        _ptr(np.ascontiguousarray(parity_mask)),
        np.ascontiguousarray(lens, dtype=np.uint32).ctypes.data_as(_U32P),
        max_len, q,
    )
    return d


def merkle_roots(
    digests: np.ndarray,
    sibs: np.ndarray,
    parity_mask: np.ndarray,
    lens: np.ndarray,
    params: Poseidon2Params,
) -> np.ndarray:
    """Walk q authentication paths at once.

    digests: (q, 4) leaf digests; sibs: (q, max_len, 4); parity_mask:
    (q, 4) uint64 bitmask (bit l set = node is right child at level l);
    lens: (q,) uint32 path lengths.  Returns (q, 4) computed roots.
    """
    lib = _load()
    c = _consts(params)
    d = np.ascontiguousarray(digests).copy()
    q, max_len = sibs.shape[0], sibs.shape[1]
    lib.p2_merkle_roots(
        _ptr(c), params.rounds_f, params.rounds_p,
        _ptr(d), _ptr(np.ascontiguousarray(sibs)),
        _ptr(np.ascontiguousarray(parity_mask)),
        np.ascontiguousarray(lens, dtype=np.uint32).ctypes.data_as(_U32P),
        max_len, q,
    )
    return d
