"""Distributed layer: mesh setup, sharded NTT/Merkle/FRI.

The reference has no distributed backend at all (rayon threads only —
SURVEY.md §2d); this layer is the analog of sequence parallelism for a
prover: trace rows are the sharded axis (§5.7), and the comm-bearing
algorithms use JAX collectives over ICI (§5.8):

    NTT         four-step transpose  -> all_to_all
    Merkle      local subtrees       -> all_gather of subtree roots
    FRI fold    half-pair exchange   -> ppermute
    scans       local scan + carry   -> GSPMD-partitioned associative_scan
"""

from .mesh import ROWS_AXIS, make_mesh, row_sharding
from .sharded import sharded_fold, sharded_merkle_root, sharded_ntt

__all__ = [
    "ROWS_AXIS",
    "make_mesh",
    "row_sharding",
    "sharded_fold",
    "sharded_merkle_root",
    "sharded_ntt",
]
