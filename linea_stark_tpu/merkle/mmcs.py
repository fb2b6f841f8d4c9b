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
from ..field.constants import NUM_LIMBS
from ..hash import poseidon2 as p2
from ..hash.hasher import make_hasher
from ..utils import fetch_global
from ..utils.export_cache import export_cached_jit

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
    # Leaf-index permutation: tree position i covers matrix row row_perm[i]
    # (p3 transcript mode commits rows in bit-reversed order; the digest
    # layer is permuted instead of the matrix, pcs/two_adic_fri.py).
    row_perm: object = None  # np.ndarray or None
    # Canonical root int when a host-side build already knows it (saves one
    # device->host fetch RTT per tree — ~12 per prove on the remote TPU).
    root_cache: int = None

    @property
    def root(self) -> jax.Array:
        return self.levels[-1][:, 0]

    def root_int(self) -> int:
        if self.root_cache is not None:
            return self.root_cache
        return fr.unpack_ints(fetch_global(self.levels[-1][..., :1]))[0]


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
        mats = [matrices[k] for k in order if heights[k] == height]
        if not mats:
            return None
        if len(mats) == 1 and hasattr(h, "hash_matrix"):
            return h.hash_matrix(mats[0])
        cols = []
        for m in mats:
            cols.extend(_matrix_columns(m))
        return h.hash_columns(cols)

    single_height = all(x == max_h for x in heights)
    if single_height and use_pallas() and max_h <= HOST_TREE_THRESHOLD:
        return _commit_host(matrices, order, h)
    d = rows_digest(max_h)
    br_start = None
    root = None
    if single_height:
        levels, br_start, root = build_levels_single(d, h)
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
    return MerkleTree(
        list(matrices), order, levels, h, br_start, root_cache=root
    )


def _fused_ok(h) -> bool:
    import os

    from ..hash.hasher import Poseidon2Hasher

    return (
        use_pallas()
        and isinstance(h, Poseidon2Hasher)
        and os.environ.get("LINEA_FUSED", "1") != "0"
    )


def _fused_single_levels_impl(d: jax.Array, params):
    """Every device tree level above a (16, N) digest layer in ONE compiled
    program: the exact-size halving sweeps down to TREE_SWEEP_SIZE plus the
    whole bit-reversed subtree chain down to the host-finish threshold.

    Rationale: the remote runtime charges ~13 ms per kernel dispatch
    regardless of size, so the previous one-dispatch-per-level chain spent
    ~15 round trips (~0.3 s) per tree on latency; fused, a 2^21-digest tree
    executes in ~0.13 s.  Compile is ~1 min per distinct layer size and
    rides the persistent compile cache.  Returns (sweep_levels,
    subtree_levels) — the latter in bit-reversed order at padded widths."""
    from ..kernels import pallas_poseidon2 as pk

    sweeps = []
    size = d.shape[-1]
    while size > TREE_SWEEP_SIZE and size > 1:
        size //= 2
        d = pk.compress(d[..., 0::2], d[..., 1::2], params)
        sweeps.append(d)
    ups = []
    if size > 1:
        padded = d
        if size < TREE_SWEEP_SIZE:
            padded = jnp.concatenate(
                [d, jnp.zeros((d.shape[0], TREE_SWEEP_SIZE - size), d.dtype)],
                axis=-1,
            )
        d_br = jnp.take(
            padded, jnp.asarray(_bitrev_table(TREE_SWEEP_SIZE)), axis=-1
        )
        buf = d_br.reshape(
            NUM_LIMBS, TREE_SWEEP_SIZE // pk._TREE_LANES, pk._TREE_LANES
        )
        h_rows = TREE_SWEEP_SIZE // pk._TREE_LANES // 2
        while h_rows * pk._TREE_LANES >= pk._SUBTREE_HOST:
            out = pk._tree_step(
                buf, jnp.asarray([h_rows], dtype=jnp.int32), params
            )
            ups.append(
                out.reshape(NUM_LIMBS, TREE_SWEEP_SIZE // 2)[
                    :, : h_rows * pk._TREE_LANES
                ]
            )
            buf = jnp.concatenate([out, out], axis=1)
            h_rows //= 2
    return tuple(sweeps), tuple(ups)


def assemble_fused_levels(d: jax.Array, sweeps, ups, params) -> tuple:
    """Host assembly of :func:`_fused_single_levels` output into the full
    level list: appends the host finish and truncates the padded-subtree
    levels to the real tree's depth.  Returns (levels, br_start, root_int)
    — root_int is the canonical root when the host finish produced it
    (always, for padded-subtree trees), else None."""
    from ..kernels import pallas_poseidon2 as pk

    max_h = d.shape[-1]
    levels = [d] + list(sweeps)
    br_start = None
    root = None
    if ups:
        tail, root = pk.host_subtree_finish(
            ups[-1][:, : pk._SUBTREE_HOST], params
        )
        all_ups = list(ups) + tail
        # The padded subtree always produces log2(TREE_SWEEP_SIZE) levels;
        # only the first log2(actual layer size) are levels of the REAL
        # tree (its root sits at position 0 there) — matching the
        # pre-fusion convention so root_int/open_batch work as-is.
        size_end = min(max_h, TREE_SWEEP_SIZE)
        br_start = len(levels)
        levels.extend(all_ups[: size_end.bit_length() - 1])
        if size_end != TREE_SWEEP_SIZE:
            # Truncated padded tree: the real root sits at position 0 of an
            # intermediate level, not at the padded-subtree root — the
            # host-finish root is NOT this tree's root.
            root = None
    return levels, br_start, root


_fused_single_levels = export_cached_jit(
    name="tree_levels", static_argnames=("params",)
)(_fused_single_levels_impl)


def build_levels_single(d: jax.Array, h) -> tuple:
    """All digest levels above a (16, N) leaf layer.  Returns
    (levels, br_start, root_int_or_None) — levels[0] is the leaf layer;
    levels at index >= ``br_start`` (when not None) are stored in
    bit-reversed order; root_int is the canonical root when a host-side
    finish already computed it (None otherwise)."""
    max_h = d.shape[-1]
    br_start = None
    if _fused_ok(h) and max_h > 1:
        sweeps, ups = _fused_single_levels(d, h.params)
        return assemble_fused_levels(d, sweeps, ups, h.params)
    if not use_pallas():
        if max_h >= 4:
            return [d] + _scan_tree_levels(d, h), None, None
        levels = [d]
        size = max_h
        while size > 1:
            size //= 2
            d = h.compress(d[..., 0::2], d[..., 1::2])
            levels.append(d)
        return levels, None, None
    # Pallas: exact-size halving sweeps down to the fixed subtree buffer
    # size, then the shape-polymorphic tree_step chain (ONE compiled
    # program for every level of every tree — per-level shapes were the
    # compile bomb, kernels/pallas_poseidon2.py).
    root = None
    levels = [d]
    size = max_h
    while size > TREE_SWEEP_SIZE and size > 1:
        size //= 2
        d = h.compress(d[..., 0::2], d[..., 1::2])
        levels.append(d)
    ups = None
    if size > 1 and getattr(h, "has_subtree_kernel", False):
        # Pad to the fixed subtree size (garbage lanes never feed any valid
        # digest) and permute to bit-reversed order (adjacent-pair
        # compression becomes half-vs-half — static slices).
        padded = d
        if size < TREE_SWEEP_SIZE:
            padded = jnp.concatenate(
                [d, jnp.zeros((d.shape[0], TREE_SWEEP_SIZE - size), d.dtype)],
                axis=-1,
            )
        d_br = jnp.take(padded, _bitrev_device(TREE_SWEEP_SIZE), axis=-1)
        # NOTE: subtree_levels finishes the tiny tree top host-side, which
        # blocks on a device->host sync.  Acceptable here because every
        # caller observes the root into the transcript immediately after —
        # but a future fused/pipelined commit path must not call this under
        # jit or expect it to be async (round-3 advisor).
        ups = h.subtree_levels(d_br)
    if size > 1 and ups is not None:
        # Levels stay at the padded subtree widths: a natural index s maps to
        # position rev(s) over log2(stored width) bits, which open_batch's
        # sibling lookup applies uniformly (correct for padded trees too —
        # the real root of a padded tree sits at position 0 of its level).
        br_start = len(levels)
        for l in range(1, size.bit_length()):
            levels.append(ups[l - 1])
    elif size > 1:
        # Hasher without a subtree kernel (Keccak): halving sweeps +
        # host finish for the tiny top.
        from ..hash import native_engine as ne
        from ..hash.hasher import KeccakHasher

        while size > HOST_TREE_THRESHOLD and size > 1:
            size //= 2
            d = h.compress(d[..., 0::2], d[..., 1::2])
            levels.append(d)
        if size > 1 and isinstance(h, KeccakHasher) and ne.available():
            # native Keccak top finish (one C call for all levels)
            leaves = ne.from_mont(ne.planes_to_u64(np.asarray(d)))
            for l in ne.kc_tree_levels(leaves):
                levels.append(
                    jnp.asarray(ne.u64_to_planes(ne.to_mont(l)))
                )
                root = ne.u64_to_ints(l)[0] if l.shape[0] == 1 else root
            size = 1
        if size > 1:
            vals = fr.unpack_ints(np.asarray(d))
            while size > 1:
                size //= 2
                vals = [
                    h.compress_ints(vals[2 * i], vals[2 * i + 1])
                    for i in range(size)
                ]
                levels.append(jnp.asarray(fr.pack_ints(vals)))
            root = int(vals[0])
    return levels, br_start, root


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
    return MerkleTree(
        list(matrices), order, levels, h, root_cache=int(vals[0])
    )


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


@jax.jit
def _gather_batch(mats, midx, lvls, lidx):
    """All row + sibling gathers of a whole opening batch in ONE dispatch.

    mats: tuple of (16, W_k, N_k); midx: ONE (n_mats, Q) index matrix;
    lvls: tuple of (16, n) digest levels; lidx: ONE (n_lvls, Q) index
    matrix (index vectors padded to one common Q, stacked host-side — a
    separate host->device transfer per level was ~190 tiny uploads per
    query phase).  Returns (16, ΣW, Q) concatenated rows and (16, L, Q)
    stacked siblings."""
    rows = (
        jnp.concatenate(
            [jnp.take(m, midx[k], axis=-1) for k, m in enumerate(mats)], axis=1
        )
        if mats
        else jnp.zeros((16, 0, midx.shape[-1]), jnp.uint32)
    )
    sibs = (
        jnp.stack(
            [jnp.take(l, lidx[k], axis=-1) for k, l in enumerate(lvls)], axis=1
        )
        if lvls
        else jnp.zeros((16, 0, 0), jnp.uint32)
    )
    return rows, sibs


def open_batch(requests) -> list:
    """Open several trees, each at its own index list, with ONE device
    dispatch + ONE host transfer.  ``requests``: [(MerkleTree, [indices])].
    Returns one list of :class:`BatchOpening` per request."""
    q_max = max((len(idx) for _, idx in requests), default=0)
    mats, midx, lvls, lidx = [], [], [], []
    lazy_rows = {}  # slot -> (16, W, q_max) np array (streamed matrices)
    meta = []
    for tree, indices in requests:
        heights = [m.shape[2] for m in tree.matrices]
        max_h = max(heights)
        log_max = max_h.bit_length() - 1
        idx_np = np.zeros(q_max, dtype=np.int64)
        idx_np[: len(indices)] = np.asarray(indices, dtype=np.int64)
        m_slots = []
        for m, h in zip(tree.matrices, heights):
            shift = log_max - (h.bit_length() - 1)
            m_slots.append((len(mats), m.shape[1]))
            ridx = idx_np >> shift
            if tree.row_perm is not None:
                ridx = tree.row_perm[ridx]
            if hasattr(m, "gather_rows"):  # streamed (LazyLde) matrix
                lazy_rows[len(mats)] = np.asarray(m.gather_rows(ridx))
                mats.append(None)
                midx.append(None)
                continue
            mats.append(m)
            midx.append(ridx.astype(np.int32))
        s_slots = []
        cur = idx_np.copy()
        for lvl in range(log_max):
            s = cur ^ 1
            if tree.br_start is not None and lvl >= tree.br_start:
                s = _bitrev_table(tree.levels[lvl].shape[-1])[s]
            s_slots.append(len(lvls))
            lvls.append(tree.levels[lvl])
            lidx.append(s.astype(np.int32))
            cur >>= 1
        meta.append((list(indices), m_slots, s_slots))

    dev_mats = [m for m in mats if m is not None]
    dev_midx = [ix for ix in midx if ix is not None]
    rows_all, sibs_all = _gather_batch(
        tuple(dev_mats),
        jnp.asarray(np.stack(dev_midx)) if dev_midx else jnp.zeros((0, q_max), jnp.int32),
        tuple(lvls),
        jnp.asarray(np.stack(lidx)) if lidx else jnp.zeros((0, q_max), jnp.int32),
    )
    rows_np, sibs_np = fetch_global(rows_all), fetch_global(sibs_all)
    rows_ints = fr.unpack_ints(rows_np) if rows_np.size else []
    sibs_ints = fr.unpack_ints(sibs_np) if sibs_np.size else []
    lazy_ints = {
        slot: fr.unpack_ints(arr.reshape(16, -1))
        for slot, arr in lazy_rows.items()
    }

    # per-slot column offsets into the concatenated device width axis
    _w_off = {}
    off = 0
    for k, m in enumerate(mats):
        if m is None:
            continue
        _w_off[k] = off
        off += m.shape[1]

    def _row_val(slot, c, q):
        if slot in lazy_ints:
            return lazy_ints[slot][c * q_max + q]
        return rows_ints[(_w_off[slot] + c) * q_max + q]

    out = []
    for (indices, m_slots, s_slots) in meta:
        openings = []
        for q, index in enumerate(indices):
            rows = [
                [_row_val(slot, c, q) for c in range(w)]
                for slot, w in m_slots
            ]
            sibs = [sibs_ints[s * q_max + q] for s in s_slots]
            openings.append(BatchOpening(int(index), rows, sibs))
        out.append(openings)
    return out


def open_at(tree: MerkleTree, indices: Sequence[int]) -> list:
    """Open the tree at several leaf indices (device gathers, host assembly)."""
    return open_batch([(tree, indices)])[0]


def verify_openings_batch(requests, hasher=None) -> bool:
    """Verify MANY single-matrix openings in one vectorized host sweep.

    ``requests``: [(root_int, (height, width), BatchOpening)].  All lanes'
    leaf row-hashes run as one vectorized numpy-object sponge, and the
    authentication-path walk runs level-by-level over the whole lane batch
    (lanes whose tree is shorter carry through unchanged) — the scalar
    per-node Python hashing made the verifier ~2x slower than the
    reference's (bench.log:69), while a device-batched walk would pay a
    per-process kernel compile far exceeding the <1s verify budget.  Only
    single-matrix commitments (no multi-height injection) are supported;
    callers with injected rows use :func:`verify_opening`.

    Returns True iff every opening verifies.
    """
    from ..hash import native_engine as ne
    from ..hash import np_poseidon2 as npp
    from ..hash import poseidon2 as p2
    from ..hash.hasher import Poseidon2Hasher

    h = make_hasher(hasher if hasher is not None else p2.DEFAULT_PARAMS)
    if not requests:
        return True
    if not isinstance(h, Poseidon2Hasher):
        from ..hash.hasher import KeccakHasher

        if isinstance(h, KeccakHasher) and ne.available():
            return _verify_openings_native(requests, None)
        return all(  # unknown hasher: scalar fallback
            verify_opening(root, [hw], op, h) for root, hw, op in requests
        )
    params = h.params
    if ne.available() and params.alpha == 11:
        return _verify_openings_native(requests, params)
    # group lanes by row width so each group's leaf hash is one batched call
    by_w = {}
    for root, (ht, w), op in requests:
        if len(op.rows) != 1 or len(op.rows[0]) != w:
            return False
        log_h = ht.bit_length() - 1
        if len(op.siblings) != log_h:
            return False
        by_w.setdefault(w, []).append((root, log_h, op))

    ok = True
    for w, lanes in by_w.items():
        q = len(lanes)
        max_l = max(l for _, l, _ in lanes)
        cols = [np.zeros(q, dtype=object) for _ in range(w)]
        sibs = np.zeros((max_l, q), dtype=object)
        parity = np.zeros((max_l, q), dtype=bool)
        active = np.zeros((max_l, q), dtype=bool)
        for k, (root, log_h, op) in enumerate(lanes):
            for c in range(w):
                cols[c][k] = op.rows[0][c]
            idx = op.index
            for l in range(log_h):
                sibs[l, k] = op.siblings[l]
                parity[l, k] = bool(idx & 1)
                active[l, k] = True
                idx >>= 1
        dig = npp.hash_columns_vec(cols, params)
        for l in range(max_l):
            left = np.where(parity[l], sibs[l], dig)
            right = np.where(parity[l], dig, sibs[l])
            nxt = npp.compress_vec(left, right, params)
            dig = np.where(active[l], nxt, dig)
        for k, (root, _, _) in enumerate(lanes):
            ok = ok and int(dig[k]) == root
    return ok


def _verify_openings_native(requests, params) -> bool:
    """All leaf hashes + every authentication-path walk in TWO native calls
    (hash/native_engine.py): leaf sponges grouped by row width, then one
    ``p2_merkle_roots`` sweep over all lanes — the whole verifier-side
    Merkle cost runs at C speed (~10 us per path vs ~4 ms scalar Python).
    ``params=None`` selects the Keccak engine (same structure, kc_* sweeps)."""
    from ..hash import native_engine as ne

    q = len(requests)
    by_w = {}
    for i, (root, (ht, w), op) in enumerate(requests):
        if len(op.rows) != 1 or len(op.rows[0]) != w:
            return False
        if len(op.siblings) != ht.bit_length() - 1:
            return False
        by_w.setdefault(w, []).append(i)
    dig = np.zeros((q, 4), np.uint64)
    for w, idxs in by_w.items():
        cols = np.stack(
            [
                ne.ints_to_u64([requests[i][2].rows[0][c] for i in idxs])
                for c in range(w)
            ]
        )
        dig[idxs] = (
            ne.kc_hash_columns(cols) if params is None
            else ne.hash_columns(cols, params)
        )
    max_l = max(len(r[2].siblings) for r in requests)
    sibs = np.zeros((q, max_l, 4), np.uint64)
    mask = np.zeros((q, 4), np.uint64)
    lens = np.zeros(q, np.uint32)
    for k, (_root, _hw, op) in enumerate(requests):
        path_len = len(op.siblings)
        lens[k] = path_len
        if path_len:
            sibs[k, :path_len] = ne.ints_to_u64(op.siblings)
        for l in range(path_len):
            if (op.index >> l) & 1:
                mask[k, l // 64] |= np.uint64(1) << np.uint64(l % 64)
    got = ne.u64_to_ints(
        ne.kc_merkle_roots(dig, sibs, mask, lens) if params is None
        else ne.merkle_roots(dig, sibs, mask, lens, params)
    )
    return all(g == r for g, (r, _, _) in zip(got, requests))


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
