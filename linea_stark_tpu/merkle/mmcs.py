"""Batch-matrix Merkle commitments (MMCS) with single-field-element digests.

TPU-native equivalent of ``MerkleTreeMmcs<Val, Val, Hash, Compress, 1>``
(bin/src/config.rs:19-20; p3-merkle-tree / p3-commit, SURVEY.md §2b).

Commit semantics (self-consistent, documented here because the fork source is
not vendored):

* A commitment covers a *batch* of matrices, each ``(16, W_k, N_k)`` with
  power-of-two heights, processed tallest-first.
* Leaf layer: the rows of every tallest matrix are hashed together (columns
  concatenated in matrix order) into one digest per row.
* Going up, adjacent digest pairs are 2-to-1 compressed; whenever matrices of
  exactly the new height exist, their row-hash is folded in with one extra
  compression: ``d = compress(compress(l, r), hash(rows))``.
* The root is the single remaining digest.

The hasher is swappable (Poseidon2 default, Keccak-256 alternative —
hash/hasher.py), mirroring the reference's type-alias config surface.

Everything below the top runs as full-width device sweeps: one leaf-hash
kernel over all N rows, then halving compression sweeps — in contrast to the
reference's per-leaf rayon tasks (~75% of its prove time, bench.log:19).
On the Pallas path the sub-threshold top levels finish host-side (they are
tiny, and each level shape would otherwise cost a remote kernel compile).
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
from ..hash.hasher import make_hasher

HOST_TREE_THRESHOLD = 256
# Digest-layer size at/below which the whole remaining subtree builds in one
# Pallas dispatch ((16, 2^15) u32 = 2 MB — comfortably VMEM-resident).
TREE_SWEEP_SIZE = 1 << 15

import functools


@functools.lru_cache(maxsize=32)
def _bitrev_table(n: int) -> "np.ndarray":
    bits = n.bit_length() - 1
    t = np.zeros(n, dtype=np.int32)
    for i in range(1, n):
        t[i] = (t[i >> 1] >> 1) | ((i & 1) << (bits - 1))
    return t


_BITREV_DEVICE: dict = {}


def _bitrev_device(n: int):
    a = _BITREV_DEVICE.get(n)
    if a is None:
        a = jnp.asarray(_bitrev_table(n))
        _BITREV_DEVICE[n] = a
    return a


@dataclass
class MerkleTree:
    """Prover-side commitment: retained matrices + every digest level.

    Levels at index >= ``br_start`` (when set) come from the whole-subtree
    kernel: they are zero-padded to a fixed width and stored in BIT-REVERSED
    index order — natural level index ``s`` lives at array position
    ``bitrev(s)`` over log2(array width) bits."""

    matrices: list          # original matrix list, (16, W_k, N_k) each
    order: list             # indices of `matrices` sorted by height desc
    levels: list            # levels[0] = (16, N_max) leaf digests, ... (16, 1)
    hasher: object
    br_start: int = None    # first bit-reversed level index, or None

    @property
    def root(self) -> jax.Array:
        return self.levels[-1][:, 0]

    def root_int(self) -> int:
        return fr.unpack_ints(np.asarray(self.levels[-1][..., :1]))[0]


def _matrix_columns(mat: jax.Array) -> list:
    return [mat[:, w] for w in range(mat.shape[1])]


def commit(matrices: Sequence[jax.Array], hasher=None) -> MerkleTree:
    """Commit to a batch of limb matrices (16, W_k, N_k)."""
    h = make_hasher(hasher if hasher is not None else p2.DEFAULT_PARAMS)
    assert len(matrices) >= 1
    heights = [m.shape[2] for m in matrices]
    for ht in heights:
        assert ht & (ht - 1) == 0, "heights must be powers of two"
    order = sorted(range(len(matrices)), key=lambda k: -heights[k])
    max_h = heights[order[0]]

    def rows_digest(height: int):
        cols = []
        for k in order:
            if heights[k] == height:
                cols.extend(_matrix_columns(matrices[k]))
        if not cols:
            return None
        return h.hash_columns(cols)

    single_height = all(x == max_h for x in heights)
    if single_height and use_pallas() and max_h <= HOST_TREE_THRESHOLD:
        return _commit_host(matrices, order, h)
    d = rows_digest(max_h)
    br_start = None
    if single_height and not use_pallas() and max_h >= 4:
        levels = [d] + _scan_tree_levels(d, h)
    elif single_height and use_pallas():
        # Halving sweeps down to VMEM residency, then ONE whole-subtree
        # kernel dispatch for every remaining level (log2(N) fewer launches
        # — launch latency dominated the FRI commit phase on a remote TPU).
        levels = [d]
        size = max_h
        while size > TREE_SWEEP_SIZE and size > 1:
            size //= 2
            d = h.compress(d[..., 0::2], d[..., 1::2])
            levels.append(d)
        ups = None
        if size > 1:
            # Pad to the fixed sweep size (one compiled kernel serves every
            # tree; garbage lanes never feed any valid digest) and permute to
            # bit-reversed order (adjacent-pair compression becomes
            # half-vs-half — the layout the kernel needs).
            padded = d
            if size < TREE_SWEEP_SIZE:
                padded = jnp.concatenate(
                    [d, jnp.zeros((d.shape[0], TREE_SWEEP_SIZE - size), d.dtype)],
                    axis=-1,
                )
            d_br = jnp.take(padded, _bitrev_device(TREE_SWEEP_SIZE), axis=-1)
            ups = getattr(h, "tree_levels_br", lambda _d: None)(d_br)
        if size > 1 and ups is not None:
            br_start = len(levels)
            for l in range(1, size.bit_length()):
                levels.append(ups[l - 1])
        elif size > 1:
            # Hasher without a subtree kernel (Keccak): halving sweeps +
            # host finish for the tiny top.
            while size > HOST_TREE_THRESHOLD and size > 1:
                size //= 2
                d = h.compress(d[..., 0::2], d[..., 1::2])
                levels.append(d)
            if size > 1:
                vals = fr.unpack_ints(np.asarray(d))
                while size > 1:
                    size //= 2
                    vals = [
                        h.compress_ints(vals[2 * i], vals[2 * i + 1])
                        for i in range(size)
                    ]
                    levels.append(jnp.asarray(fr.pack_ints(vals)))
    else:
        levels = [d]
        size = max_h
        while size > 1:
            size //= 2
            d = h.compress(d[..., 0::2], d[..., 1::2])
            inj = rows_digest(size)
            if inj is not None:
                d = h.compress(d, inj)
            levels.append(d)
    return MerkleTree(list(matrices), order, levels, h, br_start)


def _commit_host(matrices, order, h) -> MerkleTree:
    """Whole-tree host build for tiny commitments (FRI tail levels)."""
    cols = []
    for k in order:
        m = matrices[k]
        for w in range(m.shape[1]):
            cols.append(fr.unpack_ints(np.asarray(m[:, w])))
    n = len(cols[0])
    vals = [h.hash_ints([c[i] for c in cols]) for i in range(n)]
    levels = [jnp.asarray(fr.pack_ints(vals))]
    size = n
    while size > 1:
        size //= 2
        vals = [h.compress_ints(vals[2 * i], vals[2 * i + 1]) for i in range(size)]
        levels.append(jnp.asarray(fr.pack_ints(vals)))
    return MerkleTree(list(matrices), order, levels, h)


def _scan_tree_levels(leaves: jax.Array, h) -> list:
    """Upper tree levels via one fixed-shape scan (XLA path).

    Every step compresses a zero-padded (16, N/2) buffer — the same compiled
    body for all log2(N) levels, instead of one compile per level shape.
    The 2x arithmetic waste is irrelevant off-TPU; the Pallas path keeps the
    exact per-level sweeps.
    """
    n = leaves.shape[-1]
    log_n = n.bit_length() - 1
    first = h.compress(leaves[..., 0::2], leaves[..., 1::2])  # (16, n/2)

    def body(buf, _):
        nxt = h.compress(buf[..., 0::2], buf[..., 1::2])  # (16, n/4)
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


import functools


@functools.partial(jax.jit, static_argnames=())
def _gather_levels(levels, idx):
    """Gather idx[l] from each level l in one compiled dispatch.

    levels: tuple of (16, n_l) arrays (n_l halving); idx: (L, Q) int32.
    Returns (16, L, Q) — one device round-trip for a whole auth-path batch
    instead of one per level (the remote-TPU dispatch latency made per-level
    gathers the dominant cost of the FRI query phase)."""
    outs = [jnp.take(lvl, idx[l], axis=-1) for l, lvl in enumerate(levels)]
    return jnp.stack(outs, axis=1)


def open_at(tree: MerkleTree, indices: Sequence[int]) -> list:
    """Open the tree at several leaf indices (device gathers, host assembly)."""
    heights = [m.shape[2] for m in tree.matrices]
    max_h = max(heights)
    log_max = max_h.bit_length() - 1
    idx_np = np.asarray(indices, dtype=np.int32)
    idx = jnp.asarray(idx_np)

    # Rows of every matrix at its scaled index.
    rows_per_matrix = []
    for m, h in zip(tree.matrices, heights):
        shift = log_max - (h.bit_length() - 1)
        mi = idx >> shift
        rows_per_matrix.append(np.asarray(jnp.take(m, mi, axis=-1)))  # (16, W, Q)

    # Sibling digests: all (level, query) pairs in one gather.  Kernel-built
    # levels store natural index s at array position bitrev(s).
    if log_max > 0:
        sib_idx = np.empty((log_max, len(indices)), dtype=np.int32)
        cur = idx_np.copy()
        for lvl in range(log_max):
            s = cur ^ 1
            if tree.br_start is not None and lvl >= tree.br_start:
                s = _bitrev_table(tree.levels[lvl].shape[-1])[s]
            sib_idx[lvl] = s
            cur >>= 1
        sibs_all = np.asarray(
            _gather_levels(tuple(tree.levels[:log_max]), jnp.asarray(sib_idx))
        )  # (16, L, Q)
    openings = []
    for q, index in enumerate(indices):
        rows = []
        for k, rm in enumerate(rows_per_matrix):
            rows.append(fr.unpack_ints(rm[:, :, q]))
        sibs = (
            fr.unpack_ints(sibs_all[:, :, q]) if log_max > 0 else []
        )
        openings.append(BatchOpening(int(index), rows, sibs))
    return openings


def verify_opening(
    root_int: int,
    heights_widths: Sequence[tuple],
    opening: BatchOpening,
    hasher=None,
) -> bool:
    """Host-side path verification (the verifier is scalar and host-resident,
    mirroring the <1s reference verify, SURVEY.md §3.4).

    ``heights_widths``: (height, width) per matrix in the same order as the
    opening's rows (= original commit order).
    """
    h = make_hasher(hasher if hasher is not None else p2.DEFAULT_PARAMS)
    heights = [x for x, _ in heights_widths]
    for (ht, w), row in zip(heights_widths, opening.rows):
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
        return h.hash_ints(vals)

    digest = rows_digest(max_h)
    index = opening.index
    if len(opening.siblings) != log_max:
        return False
    size = max_h
    for sib in opening.siblings:
        left, right = (digest, sib) if index % 2 == 0 else (sib, digest)
        digest = h.compress_ints(left, right)
        index >>= 1
        size //= 2
        inj = rows_digest(size)
        if inj is not None:
            digest = h.compress_ints(digest, inj)
    return digest == root_int
