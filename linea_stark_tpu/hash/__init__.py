"""Hashing layer: Poseidon2 permutation, sponge, and compression."""

from .poseidon2 import (
    DEFAULT_PARAMS,
    Poseidon2Params,
    compress,
    compress_ints,
    derive_round_constants,
    hash_columns,
    hash_ints,
    permute,
    permute_ints,
)

__all__ = [
    "DEFAULT_PARAMS",
    "Poseidon2Params",
    "compress",
    "compress_ints",
    "derive_round_constants",
    "hash_columns",
    "hash_ints",
    "permute",
    "permute_ints",
]
