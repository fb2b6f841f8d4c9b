"""Keccak-256 — the alternative MMCS hasher (hasher sweep config).

The reference's config surface exposes the hasher as a swappable type alias
(bin/src/config.rs:11-18; BASELINE.json configs list "Poseidon2 vs Keccak
Merkle commitments").  This module provides:

* a host oracle (Python ints) of Keccak-f[1600] and Keccak-256 (original
  0x01 padding, NOT SHA3's 0x06), used by the verifier and tests;
* a vectorized Pallas kernel computing Keccak-256 over batches of fixed-size
  inputs, with 64-bit lanes carried as (lo, hi) uint32 pairs (the VPU has no
  64-bit integers; every op is and/or/xor/shift — pure VPU bitwise).

Digests are 32 bytes; for the field-element Merkle plumbing they are
interpreted as big-endian integers reduced mod r (the same decode rule as
trace values), so Keccak trees reuse the whole MMCS/FRI stack unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field.constants import R_MOD

# ---------------------------------------------------------------------------
# Host reference
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y]
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rotl64(v: int, r: int) -> int:
    r %= 64
    return ((v << r) | (v >> (64 - r))) & _MASK64


def keccak_f_ints(lanes: list) -> list:
    """Keccak-f[1600] on 25 ints (lane order A[x + 5y])."""
    a = list(lanes)
    for rc in _RC:
        # θ
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        a = [a[x + 5 * y] ^ d[x] for y in range(5) for x in range(5)]
        a = [a[i % 5 + 5 * (i // 5)] for i in range(25)]  # identity reindex
        # ρ and π: B[y, 2x+3y] = rotl(A[x, y], r[x][y])
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64(a[x + 5 * y], _ROT[x][y])
        # χ
        a = [
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y] & _MASK64) & b[(x + 2) % 5 + 5 * y])
            for y in range(5)
            for x in range(5)
        ]
        # ι
        a[0] ^= rc
    return a


RATE_BYTES = 136  # Keccak-256 rate


def keccak256(data: bytes) -> bytes:
    """Original Keccak-256 (0x01 padding), e.g. keccak256(b"") =
    c5d2460186f7233c…"""
    padded = bytearray(data)
    pad_len = RATE_BYTES - (len(padded) % RATE_BYTES)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    lanes = [0] * 25
    for off in range(0, len(padded), RATE_BYTES):
        block = padded[off : off + RATE_BYTES]
        for i in range(RATE_BYTES // 8):
            lanes[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        lanes = keccak_f_ints(lanes)
    out = b"".join(int(lanes[i]).to_bytes(8, "little") for i in range(4))
    return out


def keccak256_field(chunks: list) -> int:
    """Hash a list of field elements (as canonical 32-byte BE each) to a
    field element: BE-int of the digest reduced mod r."""
    data = b"".join(int(v).to_bytes(32, "big") for v in chunks)
    return int.from_bytes(keccak256(data), "big") % R_MOD


# ---------------------------------------------------------------------------
# Vectorized device path (Pallas): keccak-f over batched (lo, hi) u32 lanes
# ---------------------------------------------------------------------------

U32 = jnp.uint32


def _rotl_pair(lo, hi, r):
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        nlo = ((lo << r) | (hi >> (32 - r))) & U32(0xFFFFFFFF)
        nhi = ((hi << r) | (lo >> (32 - r))) & U32(0xFFFFFFFF)
        return nlo, nhi
    r -= 32
    # swap then rotate by r
    nlo = ((hi << r) | (lo >> (32 - r))) & U32(0xFFFFFFFF)
    nhi = ((lo << r) | (hi >> (32 - r))) & U32(0xFFFFFFFF)
    return nlo, nhi


def keccak_f_vec(lanes):
    """lanes: list of 25 (lo, hi) pairs of u32 arrays; returns same."""
    a = list(lanes)
    full = U32(0xFFFFFFFF)
    for rc in _RC:
        c = []
        for x in range(5):
            lo = a[x][0] ^ a[x + 5][0] ^ a[x + 10][0] ^ a[x + 15][0] ^ a[x + 20][0]
            hi = a[x][1] ^ a[x + 5][1] ^ a[x + 10][1] ^ a[x + 15][1] ^ a[x + 20][1]
            c.append((lo, hi))
        d = []
        for x in range(5):
            rl, rh = _rotl_pair(c[(x + 1) % 5][0], c[(x + 1) % 5][1], 1)
            d.append((c[(x - 1) % 5][0] ^ rl, c[(x - 1) % 5][1] ^ rh))
        a = [
            (a[x + 5 * y][0] ^ d[x][0], a[x + 5 * y][1] ^ d[x][1])
            for y in range(5)
            for x in range(5)
        ]
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl_pair(
                    a[x + 5 * y][0], a[x + 5 * y][1], _ROT[x][y]
                )
        a = [
            (
                b[x + 5 * y][0] ^ ((~b[(x + 1) % 5 + 5 * y][0]) & b[(x + 2) % 5 + 5 * y][0]),
                b[x + 5 * y][1] ^ ((~b[(x + 1) % 5 + 5 * y][1]) & b[(x + 2) % 5 + 5 * y][1]),
            )
            for y in range(5)
            for x in range(5)
        ]
        a[0] = (a[0][0] ^ U32(rc & 0xFFFFFFFF), a[0][1] ^ U32(rc >> 32))
    return a


def keccak256_fixed_vec(words: jax.Array) -> jax.Array:
    """Vectorized Keccak-256 of fixed-length inputs.

    words: (K, 2, N) uint32 — K 64-bit little-endian words per input as
    (lo, hi), message length K·8 bytes (must leave room for padding within
    whole blocks).  Returns (4, 2, N): the 32-byte digest as 4 words.

    Works both as plain jnp (CPU) and inside the Pallas wrapper below.
    """
    k, _, n = words.shape
    zeros = jnp.zeros((n,), U32)
    msg_bytes = 8 * k
    nblocks = (msg_bytes // RATE_BYTES) + 1
    rate_words = RATE_BYTES // 8
    lanes = [(zeros, zeros) for _ in range(25)]
    widx = 0
    for blk in range(nblocks):
        for i in range(rate_words):
            lo, hi = lanes[i]
            if widx < k:
                lo = lo ^ words[widx, 0]
                hi = hi ^ words[widx, 1]
            elif widx == k:
                lo = lo ^ U32(0x01)  # pad start
            lanes[i] = (lo, hi)
            widx += 1
        if blk == nblocks - 1:
            lo, hi = lanes[rate_words - 1]
            lanes[rate_words - 1] = (lo, hi ^ U32(0x80000000))  # pad end
        lanes = keccak_f_vec(lanes)
    out_lo = jnp.stack([lanes[i][0] for i in range(4)])
    out_hi = jnp.stack([lanes[i][1] for i in range(4)])
    return jnp.stack([out_lo, out_hi], axis=1)
