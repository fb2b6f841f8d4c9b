"""Batch-matrix Merkle commitments (MMCS) with single-field-element digests.

TPU-native equivalent of ``MerkleTreeMmcs<Val, Val, Hash, Compress, 1>``
(bin/src/config.rs:19-20; p3-merkle-tree / p3-commit, SURVEY.md §2b).

Commit semantics (self-consistent, documented here because the fork source is
not vendored):

* A commitment covers a *batch* of matrices, each ``(16, W_k, N_k)`` with
  power-of-two heights, processed tallest-first.
* Leaf layer: the rows of every tallest matrix are sponge-hashed together
  (columns concatenated in matrix order) into one digest per row.
* Going up, adjacent digest pairs are 2-to-1 compressed; whenever matrices of
  exactly the new height exist, their row-hash is folded in with one extra
  compression: ``d = compress(compress(l, r), hash(rows))``.
* The root is the single remaining digest.

Everything below the top runs as full-width device sweeps: one
``hash_columns`` kernel over all N rows, then log2(N) ``compress`` sweeps of
halving width — the layer structure XLA pipelines well, in contrast to the
reference's per-leaf rayon tasks (~75% of its prove time, bench.log:19).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import use_pallas
from ..field import fr
from ..hash import poseidon2 as p2


def _hash_columns(cols, params):
    if use_pallas():
        from ..kernels import pallas_poseidon2 as pk

        return pk.leaf_hash(jnp.stack(cols, axis=1), params)
    return p2.hash_columns(cols, params)


def _compress(left, right, params):
    if use_pallas():
        from ..kernels import pallas_poseidon2 as pk

        return pk.compress(left, right, params)
    return p2.compress(left, right, params)


@dataclass
class MerkleTree:
    """Prover-side commitment: retained matrices + every digest level."""

    matrices: list          # original matrix list, (16, W_k, N_k) each
    order: list             # indices of `matrices` sorted by height desc
    levels: list            # levels[0] = (16, N_max) leaf digests, ... (16, 1)
    params: p2.Poseidon2Params

    @property
    def root(self) -> jax.Array:
        return self.levels[-1][:, 0]

    def root_int(self) -> int:
        return fr.unpack_ints(np.asarray(self.levels[-1]))[0]


def _matrix_columns(mat: jax.Array) -> list:
    return [mat[:, w] for w in range(mat.shape[1])]


def commit(
    matrices: Sequence[jax.Array],
    params: p2.Poseidon2Params = p2.DEFAULT_PARAMS,
) -> MerkleTree:
    """Commit to a batch of limb matrices (16, W_k, N_k)."""
    assert len(matrices) >= 1
    heights = [m.shape[2] for m in matrices]
    for h in heights:
        assert h & (h - 1) == 0, "heights must be powers of two"
    order = sorted(range(len(matrices)), key=lambda k: -heights[k])
    max_h = heights[order[0]]

    def rows_digest(height: int) -> jax.Array | None:
        cols = []
        for k in order:
            if heights[k] == height:
                cols.extend(_matrix_columns(matrices[k]))
        if not cols:
            return None
        return _hash_columns(cols, params)

    single_height = all(h == max_h for h in heights)
    d = rows_digest(max_h)
    if single_height and not use_pallas() and max_h >= 4:
        levels = [d] + _scan_tree_levels(d, params)
    else:
        levels = [d]
        size = max_h
        while size > 1:
            size //= 2
            d = _compress(d[..., 0::2], d[..., 1::2], params)
            inj = rows_digest(size)
            if inj is not None:
                d = _compress(d, inj, params)
            levels.append(d)
    return MerkleTree(list(matrices), order, levels, params)


def _scan_tree_levels(leaves: jax.Array, params: p2.Poseidon2Params) -> list:
    """Upper tree levels via one fixed-shape scan (XLA path).

    Every step compresses a zero-padded (16, N/2) buffer — the same compiled
    body for all log2(N) levels, instead of one compile per level shape.
    The 2x arithmetic waste is irrelevant off-TPU; the Pallas path keeps the
    exact per-level sweeps.
    """
    n = leaves.shape[-1]
    log_n = n.bit_length() - 1
    first = p2.compress(leaves[..., 0::2], leaves[..., 1::2], params)  # (16, n/2)

    def body(buf, _):
        nxt = p2.compress(buf[..., 0::2], buf[..., 1::2], params)  # (16, n/4)
        padded = jnp.concatenate([nxt, jnp.zeros_like(nxt)], axis=-1)
        return padded, padded

    _, ys = jax.lax.scan(body, first, None, length=log_n - 1)
    levels = [first]
    size = n // 2
    for j in range(log_n - 1):
        size //= 2
        levels.append(ys[j][..., :size])
    return levels


@dataclass
class BatchOpening:
    """Opened rows + authentication path for one leaf index.

    ``rows[k]`` are the canonical int values of matrix k's row at
    (index >> (log max_h - log h_k)); ``siblings`` are the level sibling
    digests bottom-up (one per compression level of the tallest matrix).
    """

    index: int
    rows: list          # list (matrix order as committed) of list[int]
    siblings: list      # list[int], length log2(max_height)


def open_at(tree: MerkleTree, indices: Sequence[int]) -> list:
    """Open the tree at several leaf indices (device gathers, host assembly)."""
    heights = [m.shape[2] for m in tree.matrices]
    max_h = max(heights)
    log_max = max_h.bit_length() - 1
    idx = jnp.asarray(np.asarray(indices, dtype=np.int32))

    # Rows of every matrix at its scaled index.
    rows_per_matrix = []
    for m, h in zip(tree.matrices, heights):
        shift = log_max - (h.bit_length() - 1)
        mi = idx >> shift
        rows_per_matrix.append(np.asarray(jnp.take(m, mi, axis=-1)))  # (16, W, Q)

    # Sibling digests per level.
    sib_arrays = []
    cur = idx
    for lvl in range(log_max):
        sib = cur ^ 1
        sib_arrays.append(np.asarray(jnp.take(tree.levels[lvl], sib, axis=-1)))
        cur = cur >> 1
    openings = []
    for q, index in enumerate(indices):
        rows = []
        for k, rm in enumerate(rows_per_matrix):
            rows.append(fr.unpack_ints(rm[:, :, q]))
        sibs = [fr.unpack_ints(s[:, q : q + 1])[0] for s in sib_arrays]
        openings.append(BatchOpening(int(index), rows, sibs))
    return openings


def verify_opening(
    root_int: int,
    heights_widths: Sequence[tuple],
    opening: BatchOpening,
    params: p2.Poseidon2Params = p2.DEFAULT_PARAMS,
) -> bool:
    """Host-side path verification (the verifier is scalar and host-resident,
    mirroring the <1s reference verify, SURVEY.md §3.4).

    ``heights_widths``: (height, width) per matrix in the same order as the
    opening's rows (= original commit order).
    """
    heights = [h for h, _ in heights_widths]
    for (h, w), row in zip(heights_widths, opening.rows):
        if len(row) != w:
            return False
    order = sorted(range(len(heights)), key=lambda k: -heights[k])
    max_h = heights[order[0]]
    log_max = max_h.bit_length() - 1

    def rows_digest(height: int):
        vals = []
        for k in order:
            if heights[k] == height:
                vals.extend(opening.rows[k])
        if not vals:
            return None
        return p2.hash_ints(vals, params)

    digest = rows_digest(max_h)
    index = opening.index
    if len(opening.siblings) != log_max:
        return False
    size = max_h
    for sib in opening.siblings:
        left, right = (digest, sib) if index % 2 == 0 else (sib, digest)
        digest = p2.compress_ints(left, right, params)
        index >>= 1
        size //= 2
        inj = rows_digest(size)
        if inj is not None:
            digest = p2.compress_ints(digest, inj, params)
    return digest == root_int
