"""Hasher abstraction for the Merkle MMCS (Poseidon2 vs Keccak sweep).

The reference exposes the hasher as a swappable compile-time alias
(bin/src/config.rs:11-18); here it is a small runtime interface with two
implementations.  Digests are always one field element (Keccak's 32-byte
output is reduced mod r with the same BE rule as trace values), so the
whole MMCS/FRI/proof plumbing is hasher-agnostic.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import use_pallas
from ..field import fr, oracle
from ..field.constants import NUM_LIMBS, R_MOD
from . import keccak as kk
from . import poseidon2 as p2

U32 = jnp.uint32


@dataclass(frozen=True)
class Poseidon2Hasher:
    params: p2.Poseidon2Params = field(default_factory=lambda: p2.DEFAULT_PARAMS)

    def hash_columns(self, cols):
        if use_pallas():
            from ..kernels import pallas_poseidon2 as pk

            return pk.hash_columns_list(list(cols), self.params)
        return p2.hash_columns(cols, self.params)

    def hash_matrix(self, m):
        """Row-hash of a whole (16, W, N) matrix."""
        if use_pallas():
            from ..kernels import pallas_poseidon2 as pk

            return pk.leaf_hash(m, self.params)
        return p2.hash_columns([m[:, c] for c in range(m.shape[1])], self.params)

    def compress(self, left, right):
        if use_pallas():
            from ..kernels import pallas_poseidon2 as pk

            return pk.compress(left, right, self.params)
        return p2.compress(left, right, self.params)

    def hash_ints(self, vals):
        return p2.hash_ints(vals, self.params)

    def compress_ints(self, a, b):
        return p2.compress_ints(a, b, self.params)

    def subtree_levels(self, d_br):
        """All upper tree levels of a bit-reversed (16, SUBTREE_SIZE) digest
        layer (chained fixed-shape kernel dispatches + tiny host top), or
        None when unsupported (non-Pallas backends)."""
        if use_pallas():
            from ..kernels import pallas_poseidon2 as pk

            return pk.subtree_levels(d_br, self.params)
        return None

    @property
    def has_subtree_kernel(self) -> bool:
        return use_pallas()


# ---------------------------------------------------------------------------
# Keccak
# ---------------------------------------------------------------------------

def _mont_cols_to_words(cols):
    """Montgomery (16, N) columns -> (4·W, 2, N) keccak message words
    (the 32-byte BE canonical encodings, concatenated, as LE 64-bit words)."""
    from .. import fr_ops as fo

    words = []
    for col in cols:
        canon = fo.mul(col, _one_raw(col))  # from_mont: (16, N) canonical
        # BE byte j of the value = byte 31-j of the LE representation.
        # message word m_k (k=0..3) = LE64 of BE bytes [8k, 8k+8)
        #            = byteswap64(LE words of value, reversed word order).
        le_words = []
        for k in range(4):
            lo = canon[4 * k] | (canon[4 * k + 1] << 16)
            hi = canon[4 * k + 2] | (canon[4 * k + 3] << 16)
            le_words.append((lo, hi))
        for k in range(4):
            lo, hi = le_words[3 - k]
            words.append((_bswap32(hi), _bswap32(lo)))
    lo_stack = jnp.stack([w[0] for w in words])
    hi_stack = jnp.stack([w[1] for w in words])
    return jnp.stack([lo_stack, hi_stack], axis=1)  # (4W, 2, N)


def _bswap32(x):
    return (
        ((x & U32(0xFF)) << 24)
        | ((x & U32(0xFF00)) << 8)
        | ((x >> 8) & U32(0xFF00))
        | (x >> 24)
    )


def _one_raw(like):
    one = np.zeros(NUM_LIMBS, dtype=np.uint32)
    one[0] = 1
    return jnp.asarray(one).reshape((NUM_LIMBS,) + (1,) * (like.ndim - 1))


def _digest_words_to_field_mont(dw):
    """(4, 2, N) digest words (LE64 of the digest bytes) -> Montgomery field.

    BE-int(digest) = int.from_bytes(bytes, 'big'); digest bytes b[0..32) are
    lanes LE: byte j of word k = b[8k+j].  BE int = Σ b[i]·256^{31-i}: 16-bit
    limb l of the BE int = bytes (30-2l, 31-2l) -> assemble from byteswapped
    words in reversed order, then one to_mont (= reduce mod r and enter
    Montgomery form in a single multiply).
    """
    from .. import fr_ops as fo

    limbs = []
    beword = []
    for k in range(4):
        lo, hi = dw[3 - k, 0], dw[3 - k, 1]
        beword.append((_bswap32(hi), _bswap32(lo)))  # 64-bit BE value words
    # beword[k] = (lo32, hi32) of the BE-int's k-th LE 64-bit word
    for k in range(4):  # little-endian limb order
        lo, hi = beword[k]
        limbs.extend([lo & U32(0xFFFF), lo >> 16, hi & U32(0xFFFF), hi >> 16])
    raw = jnp.stack(limbs)  # (16, N) little-endian 16-bit limbs of BE int
    return fo.to_mont(raw)


@functools.partial(jax.jit, static_argnames=("tile",))
def _keccak_fixed_kernel_call(words: jax.Array, tile: int = 512) -> jax.Array:
    """Pallas sweep of keccak256_fixed_vec over the batch axis."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..kernels.pallas_field import _interpret

    k, _, n = words.shape
    t = min(tile, n)
    while n % t:
        t //= 2

    def kernel(w_ref, o_ref):
        out = kk.keccak256_fixed_vec(w_ref[:])
        o_ref[:] = out

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 2, n), words.dtype),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((k, 2, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((4, 2, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(words)


@dataclass(frozen=True)
class KeccakHasher:
    """Keccak-256 MMCS hasher with field-element digests (digest mod r)."""

    def _hash_words(self, words):
        if use_pallas():
            dw = _keccak_fixed_kernel_call(words)
        else:
            dw = kk.keccak256_fixed_vec(words)
        return _digest_words_to_field_mont(dw)

    def hash_columns(self, cols):
        return self._hash_words(_mont_cols_to_words(cols))

    def compress(self, left, right):
        return self._hash_words(_mont_cols_to_words([left, right]))

    def hash_ints(self, vals):
        return kk.keccak256_field(vals)

    def compress_ints(self, a, b):
        return kk.keccak256_field([a, b])

    @property
    def has_subtree_kernel(self) -> bool:
        return False


def make_hasher(obj):
    """Normalize: Poseidon2Params (legacy) | hasher instance -> hasher."""
    if isinstance(obj, (Poseidon2Hasher, KeccakHasher)):
        return obj
    if isinstance(obj, p2.Poseidon2Params):
        return Poseidon2Hasher(obj)
    raise TypeError(f"not a hasher: {type(obj)}")
