"""Byte <-> field codecs matching the reference's trace-value decode.

The reference decodes every 32-byte big-endian trace value with ark-ff's
``from_be_bytes_mod_order`` — a *reduction*, not a strict canonical decode
(trace/src/permutation.rs:102, trace/src/lookup.rs:266; SURVEY.md §5.9.5).
The vectorized decoder here reproduces that bit-exactly.
"""

from __future__ import annotations

import numpy as np

from .constants import LIMB_BITS, LIMB_MASK, NUM_LIMBS, R_MOD
from . import oracle


def decode_be_bytes_mod_order(data: np.ndarray, mont: bool = True) -> np.ndarray:
    """Decode an (N, 32) uint8 array of big-endian scalars into (16, N) limbs.

    Uses the native C codec (linea_stark_tpu.native) when a compiler is
    available — ~1000x faster for zkevm-scale files — with a pure-Python
    fallback.
    """
    a = np.ascontiguousarray(data, dtype=np.uint8)
    n = a.shape[0]
    assert a.shape[1] == 32
    from .. import native

    if native.available():
        return native.decode_be_mod_order(a, mont=mont)
    # Reassemble via 4 uint64 words, then reduce in Python ints (fast enough
    # off the hot path; the native/ C extension accelerates this for large
    # zkevm traces).
    words = a.reshape(n, 4, 8)
    w = np.zeros((n, 4), dtype=np.uint64)
    for b in range(8):
        w = (w << np.uint64(8)) | words[:, :, b].astype(np.uint64)
    out = np.empty((NUM_LIMBS, n), dtype=np.uint32)
    for k in range(n):
        x = (int(w[k, 0]) << 192) | (int(w[k, 1]) << 128) | (int(w[k, 2]) << 64) | int(w[k, 3])
        x %= R_MOD
        if mont:
            x = oracle.to_mont(x)
        for i in range(NUM_LIMBS):
            out[i, k] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def encode_be_bytes(limbs: np.ndarray, mont: bool = True) -> np.ndarray:
    """(16, N) limbs -> (N, 32) big-endian canonical bytes."""
    from .fr import unpack_ints

    vals = unpack_ints(limbs, mont=mont)
    out = np.empty((len(vals), 32), dtype=np.uint8)
    for k, v in enumerate(vals):
        out[k] = np.frombuffer(oracle.to_be_bytes(v), dtype=np.uint8)
    return out
