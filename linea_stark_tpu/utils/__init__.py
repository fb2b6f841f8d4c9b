"""Utilities: CBOR codec, bit tricks, span-tree timing."""
