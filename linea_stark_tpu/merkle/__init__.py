"""Merkle MMCS layer."""

from .mmcs import BatchOpening, MerkleTree, commit, open_at, verify_opening

__all__ = ["BatchOpening", "MerkleTree", "commit", "open_at", "verify_opening"]
