"""Two-adic FRI PCS: commit / open / verify over coset LDEs.

TPU-native equivalent of the fork's ``TwoAdicFriPcs`` (bin/src/main.rs:66;
p3-fri + p3-merkle-tree + p3-dft, SURVEY.md §2b).  The heavy phases — LDE,
Merkle sweeps, opening reduction, FRI folds — are whole-domain device
computations; the challenger observe/sample points are the host↔device
syncs.  FRI levels at/below a host-tail threshold fold and commit on the
host CPU through the native C engine (hash/native_engine.py): one remote
dispatch costs more wall time than an entire small level.

Two transcript modes (see pcs/__init__.py): "native" keeps codewords in
natural order and folds halves; "p3" mirrors upstream p3-fri's bit-reversed
indexing.  The two agree on all device arithmetic — a natural-order
half-pairing fold IS the bit-reversed adjacent-pair fold — so "p3" adds only
a leaf-digest permutation at commit time and bit-reversed index bookkeeping
at query time (PARITY.md §3 items 3-4).

Native mode folds with **arity 4** (one β per round; the arity-4 fold is the
two chained arity-2 folds with β, β² — f0 + β·f1 + β²·f2 + β³·f3): half the
Fiat-Shamir round trips and ~1/4 the commit hashing of the arity-2 ladder,
with the committed codeword grouped (arity, N/arity) so one leaf feeds the
next round's fold; the input openings read arity positions of the reduced
codeword.  Standard FRI arity/proof-size trade-off — soundness per query is
governed by the blowup, not the folding arity.  p3 mode keeps arity 2 for
upstream parity.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .. import fr_ops as fo
from ..field import fr, oracle
from ..field.constants import NUM_LIMBS, R_MOD
from ..fri.fold import fold_codeword, fold_pair_int
from ..hash import native_engine as ne
from ..hash.hasher import Poseidon2Hasher
from ..merkle import mmcs
from ..merkle.mmcs import _bitrev_device, _bitrev_table
from ..ntt import coset_lde, ntt
from ..ntt.ntt import _coset_scale, _powers_device, pad_coeffs, root_of_unity
from ..utils.export_cache import export_cached_jit
from ..utils.timing import span

# Proof containers are imported lazily inside the methods that build them:
# prover/__init__ imports uni_stark which imports this module, so a
# module-level import of prover.proof would close an import cycle when the
# pcs package is imported first.


class VerificationError(Exception):
    pass


def _fused() -> bool:
    """Phase-level jit on the TPU path: whole phases compile to ONE program
    each (the remote runtime charges ~13 ms per dispatch, so eager chains of
    dozens of kernels are latency-bound).  The compiled programs ride the
    persistent compile cache; LINEA_FUSED=0 reverts to eager dispatch."""
    import os

    from ..backend import use_pallas

    return use_pallas() and os.environ.get("LINEA_FUSED", "1") != "0"


# Max columns per fused-LDE program (peak-HBM bound, see commit_trace).
_LDE_GROUP = 8


@export_cached_jit(name="coset_lde", static_argnames=("log_blowup", "shift"))
def _coset_lde_jit(x, log_blowup: int, shift: int):
    return coset_lde(x, log_blowup, shift)


@export_cached_jit(name="chunk_ldes",
                   static_argnames=("log_blowup", "shift", "omega_lde"))
def _chunk_ldes_jit(chunks, log_blowup: int, shift: int, omega_lde: int):
    return _chunk_ldes_impl(chunks, log_blowup, shift, omega_lde)


@export_cached_jit(name="chunk_lde_single",
                   static_argnames=("log_blowup", "shift", "src_shift"))
def _chunk_lde_single_jit(chunk, log_blowup: int, shift: int, src_shift: int):
    """(16, 1, n) chunk evals on coset src_shift·H_n -> (16, 1, n·blowup) on
    shift·H_big — the one-chunk-at-a-time variant for heights where the
    batched transform's stage buffers exceed HBM (2^24-point streamed
    configs)."""
    return coset_lde(chunk, log_blowup, shift, src_shift_int=src_shift)


@export_cached_jit(name="chunk_coeffs",
                   static_argnames=("shift", "omega_lde"))
def _chunk_coeffs_jit(chunks, shift: int, omega_lde: int):
    """(16, B, n) chunk evals on cosets shift·ω^i -> normalized natural
    coefficients (the first half of :func:`_chunk_ldes_impl`): once each
    chunk's own coset scale is divided out, ALL chunks share the same
    pad-and-NTT-to-shift·H_big derivation — which is exactly what
    :class:`~.streaming.LazyLde` re-runs per group, so the streamed
    quotient commitment reuses the trace machinery unchanged."""
    b, n = chunks.shape[1], chunks.shape[-1]
    coeffs = ntt(chunks, inverse=True, scale=True)
    inv_shift = pow(shift, R_MOD - 2, R_MOD)
    inv_omega = pow(omega_lde, R_MOD - 2, R_MOD)
    cur = _powers_device(inv_shift, n)[:, None, :]
    size = 1
    while size < b:
        r_k = _powers_device(pow(inv_omega, size, R_MOD), n)
        cur = jnp.concatenate([cur, fo.mul(cur, r_k[:, None, :])], axis=1)
        size *= 2
    return fo.mul(coeffs, cur[:, :b])


def _chunk_ldes_impl(chunks, log_blowup: int, shift: int, omega_lde: int):
    """(16, B, n) chunk evals on cosets shift·ω^i -> (16, B, n·blowup) on
    shift·H_big; per-chunk inverse-coset scale built by block doubling so
    the NTTs run with B as a plain batch axis."""
    b, n = chunks.shape[1], chunks.shape[-1]
    coeffs = ntt(chunks, inverse=True, scale=True)
    inv_shift = pow(shift, R_MOD - 2, R_MOD)
    inv_omega = pow(omega_lde, R_MOD - 2, R_MOD)
    cur = _powers_device(inv_shift, n)[:, None, :]
    size = 1
    while size < b:
        r_k = _powers_device(pow(inv_omega, size, R_MOD), n)
        cur = jnp.concatenate([cur, fo.mul(cur, r_k[:, None, :])], axis=1)
        size *= 2
    coeffs = fo.mul(coeffs, cur[:, :b])
    padded = pad_coeffs(coeffs, log_blowup)
    big_n = n << log_blowup
    scale = _coset_scale(big_n, shift)
    padded = fo.mul(padded, scale[:, None, :])
    return ntt(padded)


# FRI folds at/below this size run on the host.  Threshold tuning on the
# v5e (BENCH_MATRIX.md): a device level costs ~60 ms of dispatch latency
# regardless of size, while the native C engine commits ~123k perms/s — so
# host wins below ~2^13 (8k perms ≈ 70 ms) and loses at 2^15 (the round-4
# first cut: +1.1 s on the 2^19 bench).  Without the C engine the
# object-array sponge (~5k perms/s) caps the affordable tail at 1024.
_FRI_HOST_TAIL_NATIVE = 1 << 13
_FRI_HOST_TAIL_OBJ = 1 << 10


def default_host_tail() -> int:
    return _FRI_HOST_TAIL_NATIVE if ne.available() else _FRI_HOST_TAIL_OBJ


def _mont_scalar(v_int: int) -> jax.Array:
    """Host int -> (16,) Montgomery device scalar."""
    return jnp.asarray(fr.pack_ints([v_int]))[:, 0]


@export_cached_jit(name="open_values")
def _open_values_jit(trace_lde, chunk_stack, zeta_s, zeta_next_s, x_vec):
    """Inverse denominators + barycentric block partials, ONE program.

    Returns (di, pa, pb, pc): di = (16, 2, n_lde) inverses of (ζ−x, ζg−x);
    p* = (16, W, 128) raw Montgomery block sums of Σ p(x)·x/(z−x) per column
    (host finishes the 128-way adds + constant factor)."""
    from ..kernels import pallas_field as pf

    shape = x_vec.shape
    zb = jnp.broadcast_to(zeta_s[:, None], shape)
    znb = jnp.broadcast_to(zeta_next_s[:, None], shape)
    di = fo.batch_inverse(
        jnp.stack([fo.sub(zb, x_vec), fo.sub(znb, x_vec)], axis=1).reshape(
            NUM_LIMBS, 2 * shape[-1]
        )
    ).reshape(NUM_LIMBS, 2, shape[-1])
    u0 = fo.mul(x_vec, di[:, 0])
    u1 = fo.mul(x_vec, di[:, 1])
    pa = pf.weighted_block_sums_128(trace_lde, u0)
    pb = pf.weighted_block_sums_128(trace_lde, u1)
    pc = pf.weighted_block_sums_128(chunk_stack, u0)
    return di, pa, pb, pc


def _finish_opened(partials, z: int, n: int, shift: int) -> list:
    """Host finish of barycentric block partials -> canonical opened ints."""
    pn = np.asarray(partials)
    w = pn.shape[1]
    vals = fr.unpack_ints(pn.reshape(NUM_LIMBS, -1), mont=False)
    s_n = pow(shift, n, R_MOD)
    const = oracle.mul(
        oracle.sub(pow(z, n, R_MOD), s_n), oracle.inv((n * s_n) % R_MOD)
    )
    out = []
    for c in range(w):
        acc = 0
        for v in vals[c * 128 : (c + 1) * 128]:
            acc = oracle.add(acc, v)
        out.append(oracle.mul(oracle.from_mont(acc), const))
    return out


@export_cached_jit(name="open_reduce")
def _reduce_fused(trace_lde, chunk_stack, di, kpow, gconsts):
    """Reduced codeword f0 = Σ_g dinv_g·(Σ_c α'^{k}·col − Σ_c α'^{k}·y_c)
    in ONE program.  kpow: (16, K) Montgomery α'-power scalars in column
    order; gconsts: (16, 3) per-group Σ α'^k·y_k."""
    f0 = None
    k = 0
    for gi, (mat, d_idx) in enumerate(
        ((trace_lde, 0), (trace_lde, 1), (chunk_stack, 0))
    ):
        num = None
        for c in range(mat.shape[1]):
            t = fo.mul_scalar_arr(mat[:, c], kpow[:, k])
            k += 1
            num = t if num is None else fo.add(num, t)
        cb = jnp.broadcast_to(gconsts[:, gi][:, None], num.shape)
        num = fo.sub(num, cb)
        term = fo.mul(num, di[:, d_idx])
        f0 = term if f0 is None else fo.add(f0, term)
    return f0


@export_cached_jit(name="fri_level", static_argnames=("params",))
def _fri_level_jit(f, beta, inv2x, params):
    """One whole FRI level — fold + halves-leaf hash + every device tree
    level — as ONE compiled program (per codeword size, persistent-cached).
    Returns (folded, leaf_digests, sweep_levels, subtree_levels)."""
    from ..fri.fold import _fold_jit
    from ..kernels import pallas_poseidon2 as pk

    folded = _fold_jit(f, beta, inv2x)
    half = folded.shape[-1] // 2
    d = pk.compress(folded[:, :half], folded[:, half:], params)
    sweeps, ups = mmcs._fused_single_levels_impl(d, params)
    return folded, d, sweeps, ups


@export_cached_jit(name="fri_round4", static_argnames=("params",))
def _fri_round4_jit(f, beta, beta2, inv2x_a, inv2x_b, params):
    """One arity-4 FRI round — TWO chained folds (β, β²), quarters-leaf
    hash, and every device tree level — as ONE compiled program.

    The arity-4 fold is exactly two arity-2 folds: with
    f = f0(x⁴) + x·f1 + x²·f2 + x³·f3, fold(fold(f, β), β²)
    = f0 + β·f1 + β²·f2 + β³·f3.  The folded codeword (size N/4) commits
    as the quarters matrix (4, N/16) so the NEXT round's query reads its 4
    fold inputs from one leaf.  Returns
    (folded, leaf_digests, sweep_levels, subtree_levels)."""
    from ..fri.fold import _fold_jit
    from ..kernels import pallas_poseidon2 as pk

    g = _fold_jit(f, beta, inv2x_a)
    folded = _fold_jit(g, beta2, inv2x_b)
    q = folded.shape[-1] // 4
    # quarters-leaf sponge: absorb (v0, v1) then (v2, v3) — 2 permutations
    s0, s1, s2 = pk.permute2(folded[:, :q], folded[:, q : 2 * q], params)
    d = pk.permute(
        folded[:, 2 * q : 3 * q], folded[:, 3 * q :], s2, params
    )[0]
    sweeps, ups = mmcs._fused_single_levels_impl(d, params)
    return folded, d, sweeps, ups


def _bitrev_int(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


@dataclass
class PcsData:
    """Prover-side state of one commitment round."""

    tree: mmcs.MerkleTree
    lde: jax.Array  # (16, W, n_lde) natural-order evals on shift·H_lde


@dataclass
class TwoAdicFriPcs:
    fri: object                 # config.FriConfig
    hasher: object              # hash.hasher instance
    shift: int
    transcript: str = "native"
    check_low_degree: bool = True
    host_tail: int = field(default_factory=default_host_tail)

    def __post_init__(self):
        # The big host tail needs native hashing (Poseidon2 or Keccak via
        # the C engine); anything else compresses scalar on the host — keep
        # its tail small enough to stay off the critical path.
        from ..hash.hasher import KeccakHasher

        if not (
            ne.available()
            and isinstance(self.hasher, (Poseidon2Hasher, KeccakHasher))
        ):
            self.host_tail = min(self.host_tail, _FRI_HOST_TAIL_OBJ)

    # ------------------------------------------------------------------
    # Commit
    # ------------------------------------------------------------------

    def commit_trace(self, trace: jax.Array):
        """Evals on H_n -> (root_int, PcsData) committed on shift·H_lde.

        The reference's ``pcs.commit(trace_domain, trace)``: coset LDE
        (bench.log:20) + Merkle commit (bench.log:19)."""
        with span("coset_lde_batch"):
            lde = self._lde(trace)
        with span("merkle commit"):
            tree = self._commit_matrix(lde)
            root = tree.root_int()
        return root, PcsData(tree, lde)

    def _lde(self, trace: jax.Array) -> jax.Array:
        """Coset LDE of the full (16, W, n) trace (override point for the
        sharded PCS, dist/pcs.py).  Heights whose LDE exceeds the HBM
        budget return a :class:`~linea_stark_tpu.pcs.streaming.LazyLde`
        (coefficient form; evals re-derived per column group)."""
        from .streaming import make_lazy_lde, want_streaming

        if isinstance(self.hasher, Poseidon2Hasher) and want_streaming(
            trace.shape[1], trace.shape[-1] << self.fri.log_blowup
        ):
            return make_lazy_lde(trace, self.fri.log_blowup, self.shift)
        if _fused():
            # Column groups bound the fused program's peak HBM: one
            # program transforming 14 columns at 2^22 exhausted the
            # chip (stage buffers alias within a single program, but
            # the peak still scales with the batch width).
            w = trace.shape[1]
            # shrink the group at very tall domains (2^24-point LDEs
            # leave no headroom for 8-wide stage buffers)
            n_lde = trace.shape[-1] << self.fri.log_blowup
            group = max(1, min(_LDE_GROUP, (1 << 25) // n_lde))
            if w <= group:
                return _coset_lde_jit(trace, self.fri.log_blowup, self.shift)
            parts = [
                _coset_lde_jit(
                    trace[:, i : i + group], self.fri.log_blowup, self.shift
                )
                for i in range(0, w, group)
            ]
            return jnp.concatenate(parts, axis=1)
        return coset_lde(trace, self.fri.log_blowup, self.shift)

    def commit_quotient(self, chunks: jax.Array):
        """Chunk evals on their own cosets -> (root_int, PcsData).

        chunks: (16, B, n), chunk i on coset shift·ω_lde^i·H_n.  All chunks
        LDE in one batched transform (vs the reference's 8 sequential
        coset_lde_batch calls of 1×n, bench.log:23-30), then one width-B
        commit — leaf hashes are identical to B width-1 matrices of equal
        height (columns concatenate in order)."""
        chunks = self._prepare_chunks(chunks)
        n = chunks.shape[-1]
        log_lde = (n.bit_length() - 1) + self.fri.log_blowup
        omega_lde = root_of_unity(log_lde)
        with span("coset_lde_batch", dims=f"{chunks.shape[1]}x{n}"):
            stack = self._chunk_ldes_batched(chunks, omega_lde)
        with span("merkle commit"):
            tree = self._commit_matrix(stack)
            root = tree.root_int()
        return root, PcsData(tree, stack)

    def _commit_matrix(self, mat: jax.Array) -> mmcs.MerkleTree:
        from .streaming import LazyLde, streamed_leaf_digests

        if isinstance(mat, LazyLde):
            d = streamed_leaf_digests(mat, self.hasher.params)
            if self.transcript == "p3":
                n = mat.shape[-1]
                d = jnp.take(d, _bitrev_device(n), axis=-1)
                levels, br_start, root = mmcs.build_levels_single(
                    d, self.hasher
                )
                levels[0] = np.asarray(levels[0])  # spill to host (1 GB)
                return mmcs.MerkleTree(
                    [mat], [0], levels, self.hasher, br_start,
                    row_perm=_bitrev_table(n), root_cache=root,
                )
            levels, br_start, root = mmcs.build_levels_single(d, self.hasher)
            # Spill the leaf-digest level (1 GB at 2^24) to the host until
            # the query phase re-uploads it — it otherwise sits in HBM
            # through the open/FRI phases, whose program peaks are within
            # a gigabyte of the budget.
            levels[0] = np.asarray(levels[0])
            return mmcs.MerkleTree(
                [mat], [0], levels, self.hasher, br_start, root_cache=root
            )
        if self.transcript == "p3":
            return self._commit_single_br(mat)
        return mmcs.commit([mat], self.hasher)

    def _commit_single_br(self, mat: jax.Array) -> mmcs.MerkleTree:
        """Single-matrix commit with rows indexed in BIT-REVERSED order
        (p3-merkle-tree commits ``bit_reverse_rows`` of the LDE).  Leaf
        digests are computed in natural row order (the same hash set), then
        permuted — one (16, N) gather instead of permuting the whole
        matrix."""
        h = self.hasher
        n = mat.shape[-1]
        if hasattr(h, "hash_matrix"):
            d = h.hash_matrix(mat)
        else:
            d = h.hash_columns([mat[:, c] for c in range(mat.shape[1])])
        d_br = jnp.take(d, _bitrev_device(n), axis=-1) if n > 1 else d
        levels, br_start, root = mmcs.build_levels_single(d_br, h)
        return mmcs.MerkleTree(
            [mat], [0], levels, h, br_start, row_perm=_bitrev_table(n),
            root_cache=root,
        )

    def _prepare_chunks(self, chunks: jax.Array) -> jax.Array:
        """Hook: placement/sharding of fresh quotient chunks (identity here;
        the sharded PCS re-anchors them to the row sharding)."""
        return chunks

    def _chunk_ldes_batched(self, chunks: jax.Array, omega_lde: int):
        from .streaming import LazyLde, default_group, want_chunk_streaming

        b, n = chunks.shape[1], chunks.shape[-1]
        if want_chunk_streaming(
            b, n << self.fri.log_blowup
        ) and isinstance(self.hasher, Poseidon2Hasher):
            # Streamed heights: don't materialize the chunk LDE at all —
            # normalize the chunks to shared coefficients and hand the
            # trace's LazyLde machinery the quotient commitment too (the
            # materialized 2^24-point stack + its batched transform
            # exceeded HBM alongside the retained trace state).
            from .streaming import hard_sync

            hard_sync(chunks)  # quotient eval still executing: serialize
            coeffs = hard_sync(
                _chunk_coeffs_jit(chunks, self.shift, omega_lde)
            )
            return LazyLde(
                coeffs, self.fri.log_blowup, self.shift,
                default_group(n << self.fri.log_blowup),
            )
        if _fused():
            return _chunk_ldes_jit(
                chunks, self.fri.log_blowup, self.shift, omega_lde
            )
        return _chunk_ldes_impl(
            chunks, self.fri.log_blowup, self.shift, omega_lde
        )

    # ------------------------------------------------------------------
    # Opened values (barycentric)
    # ------------------------------------------------------------------

    def _barycentric_open(self, matrix_lde, z, denom_inv, x_vec) -> list:
        """p(z) = (z^N − s^N)/(N·s^N) · Σ_j p(x_j)·x_j/(z−x_j) per column
        ("compute opened values with Lagrange interpolation" +
        "inverse denominators", bench.log:32-34)."""
        n = matrix_lde.shape[-1]
        s_n = pow(self.shift, n, R_MOD)
        const = oracle.mul(
            oracle.sub(pow(z, n, R_MOD), s_n), oracle.inv((n * s_n) % R_MOD)
        )
        u = fo.mul(x_vec, denom_inv)
        vals = fo.weighted_sums_to_ints(matrix_lde, u)
        return [oracle.mul(v, const) for v in vals]

    def _open_values(self, trace_lde, chunk_stack, zeta: int, zeta_next: int,
                     x_vec):
        """Inverse denominators + barycentric opened values.  Returns
        (di, trace_at_zeta, trace_at_zeta_next, chunks_at_zeta) where
        di = (16, 2, n_lde) inverses of (ζ−x, ζ·g−x).  Override point for
        the sharded PCS."""
        from .streaming import (
            LazyLde,
            _denom_single_jit,
            _group_open_partials_jit,
            _mat_open_partials_jit,
        )

        n_lde = trace_lde.shape[-1]
        if isinstance(trace_lde, LazyLde) or isinstance(chunk_stack, LazyLde):
            from .streaming import hard_sync

            log_lde = n_lde.bit_length() - 1
            omega_lde = root_of_unity(log_lde)
            with span("compute_inverse_denominators"):
                # one opening point per program, domain built in-program —
                # the stacked two-point inversion plus a retained x_vec
                # broke the HBM budget
                di0 = hard_sync(
                    _denom_single_jit(
                        _mont_scalar(zeta), omega_lde, self.shift, n_lde
                    )
                )
                di1 = hard_sync(
                    _denom_single_jit(
                        _mont_scalar(zeta_next), omega_lde, self.shift, n_lde
                    )
                )
                di = (di0, di1)

            def _partials(mat):
                """[(pa, pb)] block partials of a matrix, lazy or not."""
                if isinstance(mat, LazyLde):
                    parts = []
                    # one COLUMN at a time: the 2-column derive + both
                    # weight vectors peaked ~1 GB over budget at 2^24
                    for c0 in range(mat.shape[1]):
                        p = _group_open_partials_jit(
                            mat.coeffs[:, c0 : c0 + 1], di0, di1,
                            mat.log_blowup, mat.shift, omega_lde,
                        )
                        hard_sync(p[0])  # one derive in flight
                        parts.append(p)
                    return (
                        jnp.concatenate([p[0] for p in parts], axis=1),
                        jnp.concatenate([p[1] for p in parts], axis=1),
                    )
                return _mat_open_partials_jit(
                    mat, di0, di1, omega_lde, self.shift
                )

            with span("opened values (barycentric, streamed)"):
                pa, pb = _partials(trace_lde)
                pc, _ = _partials(chunk_stack)
                trace_at_zeta = _finish_opened(pa, zeta, n_lde, self.shift)
                trace_at_zeta_next = _finish_opened(
                    pb, zeta_next, n_lde, self.shift
                )
                chunks_at_zeta = _finish_opened(pc, zeta, n_lde, self.shift)
            return di, trace_at_zeta, trace_at_zeta_next, chunks_at_zeta
        if _fused():
            with span("compute_inverse_denominators"):
                di, pa, pb, pc = _open_values_jit(
                    trace_lde, chunk_stack,
                    _mont_scalar(zeta), _mont_scalar(zeta_next), x_vec,
                )
            with span("opened values (barycentric)"):
                trace_at_zeta = _finish_opened(pa, zeta, n_lde, self.shift)
                trace_at_zeta_next = _finish_opened(
                    pb, zeta_next, n_lde, self.shift
                )
                chunks_at_zeta = _finish_opened(pc, zeta, n_lde, self.shift)
            return di, trace_at_zeta, trace_at_zeta_next, chunks_at_zeta
        with span("compute_inverse_denominators"):
            zeta_v = fr.full((n_lde,), zeta)
            zeta_next_v = fr.full((n_lde,), zeta_next)
            di = fo.batch_inverse(
                jnp.stack(
                    [fo.sub(zeta_v, x_vec), fo.sub(zeta_next_v, x_vec)],
                    axis=1,
                ).reshape(NUM_LIMBS, 2 * n_lde)
            ).reshape(NUM_LIMBS, 2, n_lde)
        with span("opened values (barycentric)"):
            trace_at_zeta = self._barycentric_open(
                trace_lde, zeta, di[:, 0], x_vec
            )
            trace_at_zeta_next = self._barycentric_open(
                trace_lde, zeta_next, di[:, 1], x_vec
            )
            chunks_at_zeta = self._barycentric_open(
                chunk_stack, zeta, di[:, 0], x_vec
            )
        return di, trace_at_zeta, trace_at_zeta_next, chunks_at_zeta

    def _reduce_codeword(self, trace_lde, chunk_stack, di, alpha_p: int,
                         opened):
        """FRI input f0 = Σ α'^k (col(x) − y_k)/(z_k − x).  Override point
        for the sharded PCS."""
        trace_at_zeta, trace_at_zeta_next, chunks_at_zeta = opened
        from .streaming import (
            LazyLde,
            _chunk_reduce_partial_jit,
            _group_reduce_partial_jit,
        )

        n_lde = trace_lde.shape[-1]
        if isinstance(trace_lde, LazyLde) or isinstance(chunk_stack, LazyLde):
            w = trace_lde.shape[1]
            n_chunks = chunk_stack.shape[1]
            ys_all = trace_at_zeta + trace_at_zeta_next + chunks_at_zeta
            kpows = [pow(alpha_p, k, R_MOD) for k in range(len(ys_all))]

            def _gconst(kp, ys):
                return functools.reduce(
                    oracle.add,
                    (oracle.mul(k_, y_) for k_, y_ in zip(kp, ys)),
                    0,
                )

            def _accumulate(f0, mat, kp_pair, ys_pair):
                """Add Σ_d di[d]·(Σ_c kp[d][c]·col_c − Σ kp·y) for a lazy
                matrix (per group) or a materialized one (one program)."""
                if isinstance(mat, LazyLde):
                    from .streaming import hard_sync

                    for c0 in range(mat.shape[1]):  # one column per program
                        c1 = c0 + 1
                        kp = [kp_pair[0][c0:c1], kp_pair[1][c0:c1]]
                        gconst = [
                            _gconst(kp[d], ys_pair[d][c0:c1]) for d in (0, 1)
                        ]
                        f0 = hard_sync(_group_reduce_partial_jit(
                            mat.coeffs[:, c0:c1], di[0], di[1],
                            jnp.asarray(fr.pack_ints(kp[0] + kp[1])).reshape(
                                NUM_LIMBS, 2, c1 - c0
                            ),
                            jnp.asarray(fr.pack_ints(gconst)),
                            f0, mat.log_blowup, mat.shift,
                        ))
                    return f0
                return _chunk_reduce_partial_jit(
                    mat, di[0], jnp.asarray(fr.pack_ints(kp_pair[0])),
                    jnp.asarray(fr.pack_ints([_gconst(kp_pair[0],
                                                      ys_pair[0])]))[:, 0],
                    f0,
                )

            # The trace streams at 4 GB (env-tunable) and the quotient at
            # 2 GB hardcoded; since the trace is always ≥ 2× the chunk
            # bytes, a lazy quotient implies a lazy trace — the
            # materialized-matrix accumulate below handles ζ-only columns.
            assert isinstance(trace_lde, LazyLde), (
                "streamed quotient with materialized trace: raise "
                "LINEA_STREAM_LDE_BYTES consistency"
            )
            f0 = fr.zeros((n_lde,))
            f0 = _accumulate(
                f0, trace_lde,
                (kpows[:w], kpows[w : 2 * w]),
                (trace_at_zeta, trace_at_zeta_next),
            )
            # chunks open at ζ only: when lazy, the ζ·g half rides zero
            # coefficients (its term vanishes; reuses the same program)
            zero_kp = [0] * n_chunks
            return _accumulate(
                f0, chunk_stack, (kpows[2 * w :], zero_kp),
                (chunks_at_zeta, zero_kp),
            )
        if _fused():
            w = trace_lde.shape[1]
            n_chunks = chunk_stack.shape[1]
            ys_all = trace_at_zeta + trace_at_zeta_next + chunks_at_zeta
            # column k's coefficient is α'^k starting at α'^0
            # (matching the eager loop's k=1 initial value)
            kpows = [pow(alpha_p, k, R_MOD) for k in range(len(ys_all))]
            gconsts = []
            k = 0
            for gw in (w, w, n_chunks):
                acc = 0
                for _ in range(gw):
                    acc = oracle.add(acc, oracle.mul(kpows[k], ys_all[k]))
                    k += 1
                gconsts.append(acc)
            return _reduce_fused(
                trace_lde, chunk_stack, di,
                jnp.asarray(fr.pack_ints(kpows)),
                jnp.asarray(fr.pack_ints(gconsts)),
            )
        f0 = fr.zeros((n_lde,))
        k = 1
        for mat, ys, dinv in (
            (trace_lde, trace_at_zeta, di[:, 0]),
            (trace_lde, trace_at_zeta_next, di[:, 1]),
            (chunk_stack, chunks_at_zeta, di[:, 0]),
        ):
            num = fr.zeros((n_lde,))
            for c in range(mat.shape[1]):
                col = fo.sub(mat[:, c], fr.full((n_lde,), ys[c]))
                num = fo.add(num, fo.mul_const(col, k))
                k = oracle.mul(k, alpha_p)
            f0 = fo.add(f0, fo.mul(num, dinv))
        return f0

    # ------------------------------------------------------------------
    # Open (opened values + FRI proof); owns the challenger during opening
    # ------------------------------------------------------------------

    def open(self, trace_data: PcsData, quot_data: PcsData, zeta: int,
             zeta_next: int, challenger):
        """Returns (trace_at_zeta, trace_at_zeta_next, chunks_at_zeta,
        FriProof).  Transcript-mode differences:

        * native — opened values observed, then α' sampled.
        * p3     — α' sampled first (p3-fri's ``open`` samples the batching
          challenge before computing reduced openings), nothing observed.
        """
        trace_lde, chunk_stack = trace_data.lde, quot_data.lde
        n_lde = trace_lde.shape[-1]
        log_lde = n_lde.bit_length() - 1
        omega_lde = root_of_unity(log_lde)

        with span("open"):
            from .streaming import LazyLde as _LazyLde

            streamed = isinstance(trace_lde, _LazyLde) or isinstance(
                chunk_stack, _LazyLde
            )
            # streamed heights build the domain vector inside each program
            # instead of retaining a 1 GB table across the phase
            x_vec = (
                None
                if streamed
                else fo.mul_const(
                    _powers_device(omega_lde, n_lde), self.shift
                )
            )
            (
                di,
                trace_at_zeta,
                trace_at_zeta_next,
                chunks_at_zeta,
            ) = self._open_values(trace_lde, chunk_stack, zeta, zeta_next, x_vec)

            if self.transcript == "p3":
                alpha_p = challenger.sample()
            else:
                for v in trace_at_zeta:
                    challenger.observe(v)
                for v in trace_at_zeta_next:
                    challenger.observe(v)
                for v in chunks_at_zeta:
                    challenger.observe(v)
                alpha_p = challenger.sample()

            # Reduced codeword f0 = Σ α'^k (col(x) − y)/(z − x), k over
            # [trace@ζ cols, trace@ζ·g cols, chunks@ζ].
            with span("reduce matrix quotient"):
                f0 = self._reduce_codeword(
                    trace_lde, chunk_stack, di, alpha_p,
                    (trace_at_zeta, trace_at_zeta_next, chunks_at_zeta),
                )
            # the denominators/domain vectors (3 GB at streamed heights)
            # would otherwise stay live through the whole FRI ladder
            del di, x_vec

        with span("FRI prover"):
            if self.transcript == "p3":
                fri_proof = self._fri_prove_p3(
                    f0, trace_data.tree, quot_data.tree, challenger
                )
            else:
                fri_proof = self._fri_prove_native(
                    f0, trace_data.tree, quot_data.tree, challenger
                )
        return trace_at_zeta, trace_at_zeta_next, chunks_at_zeta, fri_proof

    # ------------------------------------------------------------------
    # FRI ladder primitives (override points for the sharded PCS)
    # ------------------------------------------------------------------

    def _use_fused_levels(self) -> bool:
        """Whether device FRI levels run as ONE fused program each
        (_fri_level_jit / _fri_round4_jit) — single-chip Pallas path only."""
        return _fused() and isinstance(self.hasher, Poseidon2Hasher)

    def _fold_device(self, f, beta_int: int, cur_shift: int, cur_omega: int):
        """One device fold of a (16, N) codeword to (16, N/2)."""
        return fold_codeword(f, beta_int, cur_shift, cur_omega)

    def _commit_grouped(self, f, arity: int):
        """Commit a folded codeword grouped so one leaf holds the next
        round's ``arity`` fold inputs: the (arity, N/arity) matrix whose
        leaf j is [f(j), f(j + N/a), ...] — a free reshape of natural
        order (native transcript's per-round commitment)."""
        size = f.shape[-1]
        q = size // arity
        groups = jnp.stack([f[:, k * q : (k + 1) * q] for k in range(arity)],
                           axis=1)
        return mmcs.commit([groups], self.hasher)

    def _round_plan(self, n_lde: int):
        """Deterministic native-mode fold schedule: [(size, arity,
        committed)] per round + final codeword size.  Arity 4 while a
        quarter still exceeds the final size (half the rounds and ~1/4 the
        commit hashing of arity-2), one arity-2 round to land exactly on
        ``final_size`` when needed; the last fold's result is sent as
        final_poly, not committed.  The verifier recomputes the same plan."""
        final = 1 << (self.fri.log_blowup + self.fri.log_final_poly_len)
        plan = []
        size = n_lde
        while size > final:
            arity = 4 if size // 4 >= final else 2
            new = size // arity
            plan.append((size, arity, new > final))
            size = new
        return plan, final

    # ------------------------------------------------------------------
    # FRI commit phase — native transcript (fold, then commit the result)
    # ------------------------------------------------------------------

    def _fri_prove_native(self, f0, trace_tree, quotient_tree, challenger):
        from ..prover.proof import (
            CommitPhaseStep,
            FriProof,
            P3QueryProof,
            QueryProof,
        )

        fri_cfg = self.fri
        n_lde = f0.shape[-1]
        log_lde = n_lde.bit_length() - 1
        plan, final_size = self._round_plan(n_lde)
        f = f0
        f_host = None  # _HostTail state once the tail goes host-side
        cur_shift, cur_omega, size = self.shift, root_of_unity(log_lde), n_lde
        betas, fold_trees, fold_roots = [], [], []
        tail = _HostTail(self.hasher)

        commit_span = span("commit phase (fold+commit per round)")
        commit_span.__enter__()
        from ..fri.fold import _inv2x_table

        fused_levels = self._use_fused_levels()
        for size_r, arity, will_commit in plan:
            assert size == size_r
            beta = challenger.sample()
            betas.append(beta)
            beta2 = oracle.mul(beta, beta)
            if f_host is None and size <= 2 * self.host_tail:
                f_host = tail.from_device(f)
            new_size = size // arity
            # next round's arity decides the committed grouping (one leaf =
            # that round's fold inputs)
            next_arity = 4 if new_size // 4 >= final_size else 2
            shift2 = (cur_shift * cur_shift) % R_MOD
            omega2 = (cur_omega * cur_omega) % R_MOD
            if (
                f_host is None and fused_levels and will_commit
                and arity == next_arity
            ):
                # whole round (fold(s) + leaf hash + tree) in one program
                if arity == 4:
                    f, d, sweeps, ups = _fri_round4_jit(
                        f, _mont_scalar(beta), _mont_scalar(beta2),
                        _inv2x_table(cur_shift, cur_omega, size // 2),
                        _inv2x_table(shift2, omega2, size // 4),
                        self.hasher.params,
                    )
                else:
                    f, d, sweeps, ups = _fri_level_jit(
                        f, _mont_scalar(beta),
                        _inv2x_table(cur_shift, cur_omega, size // 2),
                        self.hasher.params,
                    )
                size = new_size
                cur_shift = pow(cur_shift, arity, R_MOD)
                cur_omega = pow(cur_omega, arity, R_MOD)
                levels, br_start, root_c = mmcs.assemble_fused_levels(
                    d, sweeps, ups, self.hasher.params
                )
                # grouped matrix of the folded codeword is a free reshape
                groups = f.reshape(NUM_LIMBS, arity, size // arity)
                t = mmcs.MerkleTree(
                    [groups], [0], levels, self.hasher, br_start,
                    root_cache=root_c,
                )
                root = t.root_int()
                fold_trees.append(t)
                fold_roots.append(root)
                challenger.observe(root)
                continue
            if f_host is None:
                f = self._fold_device(f, beta, cur_shift, cur_omega)
                if arity == 4:
                    f = self._fold_device(f, beta2, shift2, omega2)
            else:
                f_host = tail.fold(f_host, beta, cur_shift, cur_omega)
                if arity == 4:
                    f_host = tail.fold(f_host, beta2, shift2, omega2)
            cur_shift = pow(cur_shift, arity, R_MOD)
            cur_omega = pow(cur_omega, arity, R_MOD)
            size = new_size
            if will_commit:
                if f_host is None:
                    t = self._commit_grouped(f, next_arity)
                    root = t.root_int()
                else:
                    t, root = tail.commit_grouped(
                        f_host, next_arity, bit_reverse=False
                    )
                fold_trees.append(t)
                fold_roots.append(root)
                challenger.observe(root)
        commit_span.__exit__(None, None, None)

        if f_host is None:
            f_host = tail.from_device(f)
        final_poly = self._final_poly(tail.to_ints(f_host), cur_shift)
        for c in final_poly:
            challenger.observe(c)

        pow_witness = self._grind(challenger)

        with span("query phase"):
            a0 = plan[0][1] if plan else 2
            seg0 = n_lde // a0
            indices = [
                challenger.sample_bits(log_lde - (a0.bit_length() - 1))
                for _ in range(fri_cfg.num_queries)
            ]
            query_proofs = []
            # Every tree's row + auth-path gathers ride ONE device dispatch
            # (the remote-TPU query phase was dispatch-latency-bound).
            spread = [
                i + k * seg0 for k in range(a0) for i in indices
            ]
            requests = [(trace_tree, spread), (quotient_tree, spread)]
            for t in fold_trees:
                lc = t.matrices[0].shape[-1]  # leaf count of grouped matrix
                requests.append((t, [idx % lc for idx in indices]))
            opened = mmcs.open_batch(requests)
            nq = fri_cfg.num_queries
            for qi in range(nq):
                t_opens = [opened[0][k * nq + qi] for k in range(a0)]
                q_opens = [opened[1][k * nq + qi] for k in range(a0)]
                query_proofs.append(
                    QueryProof(
                        input_openings=[t_opens, q_opens],
                        commit_openings=[
                            opened[2 + r][qi] for r in range(len(fold_trees))
                        ],
                    )
                )

        return FriProof(
            commit_roots=fold_roots,
            final_poly=final_poly,
            pow_witness=pow_witness,
            query_proofs=query_proofs,
        )

    # ------------------------------------------------------------------
    # FRI commit phase — p3 transcript (commit the CURRENT codeword, then
    # observe, then sample β, then fold; every fold is committed)
    # ------------------------------------------------------------------

    def _fri_prove_p3(self, f0, trace_tree, quotient_tree, challenger):
        from ..prover.proof import (
            CommitPhaseStep,
            FriProof,
            P3QueryProof,
            QueryProof,
        )

        fri_cfg = self.fri
        n_lde = f0.shape[-1]
        log_lde = n_lde.bit_length() - 1
        final_size = 1 << (fri_cfg.log_blowup + fri_cfg.log_final_poly_len)
        f = f0
        f_host = None
        cur_shift, cur_omega, size = self.shift, root_of_unity(log_lde), n_lde
        betas, fold_trees, fold_roots = [], [], []
        tail = _HostTail(self.hasher)

        commit_span = span("commit phase (commit+fold per level)")
        commit_span.__enter__()
        while size > final_size:
            if f_host is None and size <= self.host_tail:
                f_host = tail.from_device(f)
            # Commit the current codeword paired as BR-adjacent rows: the
            # natural half-pairing (f[j], f[j+half]) IS the bit-reversed
            # adjacent pair, so the leaves matrix is the halves stack and
            # only the digest layer is permuted.
            if f_host is None:
                halves = jnp.stack([f[:, : size // 2], f[:, size // 2 :]], axis=1)
                t = self._commit_single_br(halves)
                root = t.root_int()
            else:
                t, root = tail.commit_halves(f_host, bit_reverse=True)
            fold_trees.append(t)
            fold_roots.append(root)
            challenger.observe(root)
            beta = challenger.sample()
            betas.append(beta)
            if f_host is None:
                f = self._fold_device(f, beta, cur_shift, cur_omega)
            else:
                f_host = tail.fold(f_host, beta, cur_shift, cur_omega)
            cur_shift = (cur_shift * cur_shift) % R_MOD
            cur_omega = (cur_omega * cur_omega) % R_MOD
            size //= 2
        commit_span.__exit__(None, None, None)

        if f_host is None:
            f_host = tail.from_device(f)
        final_poly = self._final_poly(tail.to_ints(f_host), cur_shift)
        for c in final_poly:
            challenger.observe(c)

        pow_witness = self._grind(challenger)

        with span("query phase"):
            # p3-fri samples log_max_height bits: the FULL codeword height.
            indices = [
                challenger.sample_bits(log_lde)
                for _ in range(fri_cfg.num_queries)
            ]
            requests = [(trace_tree, indices), (quotient_tree, indices)]
            for l, t in enumerate(fold_trees):
                requests.append((t, [(q >> l) >> 1 for q in indices]))
            opened = mmcs.open_batch(requests)
            query_proofs = []
            for qi, q in enumerate(indices):
                steps = []
                for l in range(len(fold_trees)):
                    op = opened[2 + l][qi]
                    q_l = q >> l
                    # opened row = (F_br[2i], F_br[2i+1]); own value sits at
                    # parity q_l & 1 — ship only the sibling (p3's
                    # CommitPhaseProofStep { sibling_value, opening_proof }).
                    steps.append(
                        CommitPhaseStep(
                            sibling_value=op.rows[0][(q_l & 1) ^ 1],
                            path=list(op.siblings),
                        )
                    )
                query_proofs.append(
                    P3QueryProof(
                        input_openings=[opened[0][qi], opened[1][qi]],
                        commit_steps=steps,
                    )
                )

        return FriProof(
            commit_roots=fold_roots,
            final_poly=final_poly,
            pow_witness=pow_witness,
            query_proofs=query_proofs,
        )

    # ------------------------------------------------------------------

    def _final_poly(self, evals: list, shift_int: int) -> list:
        """Coefficients of the final codeword's polynomial on shift·H (naive
        O(m²) inverse DFT — m is tiny); asserts the low-degree tail."""
        m = len(evals)
        coeffs = _interpolate_host(evals, shift_int)
        n_final = 1 << self.fri.log_final_poly_len
        if self.check_low_degree:
            assert all(
                v == 0 for v in coeffs[n_final:]
            ), "final codeword not low degree"
        return coeffs[:n_final]

    def _grind(self, challenger) -> int:
        with span("grind PoW"):
            from ..fri.grind import grind as grind_pow

            bits = self.fri.proof_of_work_bits
            if bits > 0:
                return grind_pow(challenger, bits)
            challenger.observe(0)
            assert challenger.sample_bits(0) == 0
            return 0

    # ------------------------------------------------------------------
    # Verify (host-side)
    # ------------------------------------------------------------------

    def verify(self, trace_root: int, quotient_root: int, dims,
               opened_values, zeta: int, zeta_next: int, fri_proof: FriProof,
               challenger) -> None:
        """Replays the PCS slice of the transcript and checks every Merkle
        opening + FRI fold walk.  ``dims`` = ((n_lde, w), (n_lde, n_chunks));
        ``opened_values`` = (trace_at_zeta, trace_at_zeta_next,
        chunks_at_zeta).  Raises VerificationError."""
        if self.transcript == "p3":
            return self._verify_p3(
                trace_root, quotient_root, dims, opened_values, zeta,
                zeta_next, fri_proof, challenger,
            )
        return self._verify_native(
            trace_root, quotient_root, dims, opened_values, zeta, zeta_next,
            fri_proof, challenger,
        )

    def _replay_tail(self, fri_proof, challenger) -> None:
        """Common transcript tail: final poly observation + PoW check (the
        β sampling interleave is mode-specific and handled by the caller)."""
        if len(fri_proof.final_poly) != 1 << self.fri.log_final_poly_len:
            raise VerificationError("bad final poly length")
        for c in fri_proof.final_poly:
            challenger.observe(c)
        if not challenger.check_witness(
            self.fri.proof_of_work_bits, fri_proof.pow_witness
        ):
            raise VerificationError("proof-of-work check failed")

    def _verify_native(self, trace_root, quotient_root, dims, opened_values,
                       zeta, zeta_next, fri_proof, challenger) -> None:
        fri_cfg = self.fri
        (n_lde, w), (_, n_chunks) = dims
        log_lde = n_lde.bit_length() - 1
        omega_lde = root_of_unity(log_lde)
        trace_at_zeta, trace_at_zeta_next, chunks_at_zeta = opened_values

        for v in trace_at_zeta:
            challenger.observe(v)
        for v in trace_at_zeta_next:
            challenger.observe(v)
        for v in chunks_at_zeta:
            challenger.observe(v)
        alpha_p = challenger.sample()

        plan, final_size = self._round_plan(n_lde)
        n_committed = sum(1 for p in plan if p[2])
        if len(fri_proof.commit_roots) != n_committed:
            raise VerificationError("wrong number of FRI commitments")
        betas = []
        ci = 0
        for _size_r, _arity, committed in plan:
            betas.append(challenger.sample())
            if committed:
                challenger.observe(fri_proof.commit_roots[ci])
                ci += 1
        self._replay_tail(fri_proof, challenger)
        a0 = plan[0][1] if plan else 2
        seg0 = n_lde // a0
        indices = [
            challenger.sample_bits(log_lde - (a0.bit_length() - 1))
            for _ in range(fri_cfg.num_queries)
        ]
        # round r >= 1 reads committed tree r-1: grouping = round r's arity
        groupings = [plan[r][1] for r in range(1, len(plan))]

        # Merkle openings: one vectorized host sweep for every query
        merkle_requests = []
        for qi, idx in enumerate(indices):
            qp = fri_proof.query_proofs[qi]
            if len(qp.input_openings) != 2 or any(
                len(group) != a0 for group in qp.input_openings
            ):
                raise VerificationError("malformed input openings")
            t_ops, q_ops = qp.input_openings
            for k in range(a0):
                want = idx + k * seg0
                if t_ops[k].index != want or q_ops[k].index != want:
                    raise VerificationError("opening index mismatch")
                merkle_requests.append((trace_root, (n_lde, w), t_ops[k]))
                merkle_requests.append(
                    (quotient_root, (n_lde, n_chunks), q_ops[k])
                )
            if len(qp.commit_openings) != n_committed:
                raise VerificationError("malformed fold openings")
            size_q = n_lde // a0
            for r, g in enumerate(groupings):
                lc = size_q // g
                merkle_requests.append(
                    (
                        fri_proof.commit_roots[r],
                        (lc, g),
                        qp.commit_openings[r],
                    )
                )
                size_q //= g
        if not mmcs.verify_openings_batch(merkle_requests, self.hasher):
            raise VerificationError("Merkle opening failed")

        for qi, idx in enumerate(indices):
            qp = fri_proof.query_proofs[qi]
            t_ops, q_ops = qp.input_openings
            x0 = oracle.mul(self.shift, pow(omega_lde, idx, R_MOD))
            i_fac = pow(omega_lde, seg0, R_MOD)
            vals = []
            x_k = x0
            for k in range(a0):
                vals.append(
                    _reduced_at(
                        x_k, t_ops[k].rows[0], q_ops[k].rows[0], zeta,
                        zeta_next, trace_at_zeta, trace_at_zeta_next,
                        chunks_at_zeta, alpha_p,
                    )
                )
                x_k = oracle.mul(x_k, i_fac)
            v = _fold_arity_int(vals, x0, i_fac, betas[0])
            pos = idx
            cur_shift = pow(self.shift, a0, R_MOD)
            cur_omega = pow(omega_lde, a0, R_MOD)
            size = n_lde // a0
            for r, g in enumerate(groupings):
                lc = size // g
                p = pos % lc
                op = qp.commit_openings[r]
                if op.index != p:
                    raise VerificationError("fold opening index mismatch")
                row = op.rows[0]
                if row[pos // lc] != v:
                    raise VerificationError(
                        f"fold consistency failed (query {qi}, round {r + 1})"
                    )
                x_p = oracle.mul(cur_shift, pow(cur_omega, p, R_MOD))
                v = _fold_arity_int(
                    row, x_p, pow(cur_omega, lc, R_MOD), betas[r + 1]
                )
                pos = p
                cur_shift = pow(cur_shift, g, R_MOD)
                cur_omega = pow(cur_omega, g, R_MOD)
                size = lc

            x_fin = oracle.mul(cur_shift, pow(cur_omega, pos, R_MOD))
            acc = 0
            for c in reversed(fri_proof.final_poly):
                acc = oracle.add(oracle.mul(acc, x_fin), c)
            if v != acc:
                raise VerificationError("final polynomial check failed")

    def _verify_p3(self, trace_root, quotient_root, dims, opened_values,
                   zeta, zeta_next, fri_proof, challenger) -> None:
        fri_cfg = self.fri
        (n_lde, w), (_, n_chunks) = dims
        log_lde = n_lde.bit_length() - 1
        omega_lde = root_of_unity(log_lde)
        trace_at_zeta, trace_at_zeta_next, chunks_at_zeta = opened_values

        alpha_p = challenger.sample()
        num_levels = log_lde - fri_cfg.log_blowup - fri_cfg.log_final_poly_len
        if len(fri_proof.commit_roots) != num_levels:
            raise VerificationError("wrong number of FRI commitments")
        betas = []
        for li in range(num_levels):
            challenger.observe(fri_proof.commit_roots[li])
            betas.append(challenger.sample())
        self._replay_tail(fri_proof, challenger)
        indices = [
            challenger.sample_bits(log_lde)
            for _ in range(fri_cfg.num_queries)
        ]

        merkle_requests = []
        for qi, q in enumerate(indices):
            qp = fri_proof.query_proofs[qi]
            if len(qp.input_openings) != 2:
                raise VerificationError("malformed input openings")
            t_op, q_op = qp.input_openings
            for op in (t_op, q_op):
                # p3's wire format does not carry indices (the verifier
                # re-derives them from the challenger); -1 marks a decoded
                # proof — stamp the derived index in.
                if op.index == -1:
                    op.index = q
                elif op.index != q:
                    raise VerificationError("opening index mismatch")
            merkle_requests.append((trace_root, (n_lde, w), t_op))
            merkle_requests.append((quotient_root, (n_lde, n_chunks), q_op))
            if len(qp.commit_steps) != num_levels:
                raise VerificationError("malformed fold openings")

        # Fold walks: the committed row at level l is reconstructed from the
        # carried value + the proof's sibling, so the Merkle check binds the
        # walk (p3-fri's CommitPhaseProofStep semantics).
        for qi, q in enumerate(indices):
            qp = fri_proof.query_proofs[qi]
            t_op, q_op = qp.input_openings
            x = oracle.mul(
                self.shift, pow(omega_lde, _bitrev_int(q, log_lde), R_MOD)
            )
            v = _reduced_at(
                x, t_op.rows[0], q_op.rows[0], zeta, zeta_next,
                trace_at_zeta, trace_at_zeta_next, chunks_at_zeta, alpha_p,
            )
            cur_shift, cur_omega = self.shift, omega_lde
            size = n_lde
            pos = q
            for li, step in enumerate(qp.commit_steps):
                i = pos >> 1
                parity = pos & 1
                f_lo, f_hi = (v, step.sibling_value) if parity == 0 else (
                    step.sibling_value, v,
                )
                merkle_requests.append(
                    (
                        fri_proof.commit_roots[li],
                        (size // 2, 2),
                        mmcs.BatchOpening(i, [[f_lo, f_hi]], list(step.path)),
                    )
                )
                log_half = (size // 2).bit_length() - 1
                j = _bitrev_int(i, log_half) if log_half else 0
                x_lo = oracle.mul(cur_shift, pow(cur_omega, j, R_MOD))
                v = fold_pair_int(f_lo, f_hi, x_lo, betas[li])
                pos = i
                cur_shift = (cur_shift * cur_shift) % R_MOD
                cur_omega = (cur_omega * cur_omega) % R_MOD
                size //= 2

            log_m = size.bit_length() - 1
            x_fin = oracle.mul(
                cur_shift, pow(cur_omega, _bitrev_int(pos, log_m), R_MOD)
            )
            acc = 0
            for c in reversed(fri_proof.final_poly):
                acc = oracle.add(oracle.mul(acc, x_fin), c)
            if v != acc:
                raise VerificationError("final polynomial check failed")

        if not mmcs.verify_openings_batch(merkle_requests, self.hasher):
            raise VerificationError("Merkle opening failed")


def _fold_arity_int(vals: list, x0: int, i_fac: int, beta: int) -> int:
    """Scalar arity-2/4 fold of [f(x0·i_fac^k)] with challenge β (the
    verifier-side mirror of one native FRI round; arity 4 = the two chained
    arity-2 folds with β, β²)."""
    if len(vals) == 2:
        return fold_pair_int(vals[0], vals[1], x0, beta)
    assert len(vals) == 4
    g_lo = fold_pair_int(vals[0], vals[2], x0, beta)
    g_hi = fold_pair_int(vals[1], vals[3], oracle.mul(x0, i_fac), beta)
    return fold_pair_int(
        g_lo, g_hi, oracle.mul(x0, x0), oracle.mul(beta, beta)
    )


def _reduced_at(x, trace_row, quot_row, zeta, zeta_next, trace_at_zeta,
                trace_at_zeta_next, chunks_at_zeta, alpha_p) -> int:
    """Reduced-codeword value at point x from opened rows (the verifier-side
    mirror of the prover's reduce-matrix-quotient)."""
    acc = 0
    k = 1
    for rows, z, ys in (
        (trace_row, zeta, trace_at_zeta),
        (trace_row, zeta_next, trace_at_zeta_next),
        (quot_row, zeta, chunks_at_zeta),
    ):
        num = 0
        for c, rv in enumerate(rows):
            num = oracle.add(num, oracle.mul(k, oracle.sub(rv, ys[c])))
            k = oracle.mul(k, alpha_p)
        acc = oracle.add(acc, oracle.mul(num, oracle.inv(oracle.sub(z, x))))
    return acc


# ---------------------------------------------------------------------------
# Host tail: fold + commit small FRI levels on the CPU
# ---------------------------------------------------------------------------

class _HostTail:
    """Codeword state for the host-side FRI tail.

    Uses the native C engine ((n, 4) u64 canonical rows) when available —
    a whole 2^15 tail costs ~0.4 s — falling back to numpy object arrays.
    Folding is pure field arithmetic (hasher-independent, native whenever
    the engine exists); commits go native for Poseidon2 AND Keccak (the
    kc_* sweeps), scalar Python for anything else.
    """

    def __init__(self, hasher):
        from ..hash.hasher import KeccakHasher

        self.hasher = hasher
        avail = ne.available()
        self.native_field = avail
        self.native = avail and isinstance(hasher, Poseidon2Hasher)
        self.native_kc = avail and isinstance(hasher, KeccakHasher)

    def from_device(self, f: jax.Array):
        planes = np.asarray(f)
        if self.native_field:
            return ne.from_mont(ne.planes_to_u64(planes))
        return np.array(fr.unpack_ints(planes), dtype=object)

    def to_ints(self, state) -> list:
        if self.native_field:
            return ne.u64_to_ints(state)
        return [int(v) for v in state]

    def fold(self, state, beta: int, shift_int: int, omega_int: int):
        if self.native_field:
            return ne.fold(state, beta, shift_int, omega_int)
        from ..hash import np_poseidon2 as npp

        return npp.fold_vec(state, beta, shift_int, omega_int)

    def commit_halves(self, state, bit_reverse: bool):
        """Arity-2 grouping (the p3 ladder's per-level commitment)."""
        return self.commit_grouped(state, 2, bit_reverse)

    def commit_grouped(self, state, arity: int, bit_reverse: bool):
        """Commit the arity-grouping of the codeword; returns (tree, root).
        Leaf j hashes [f(j), f(j+n/a), ...] (the next round's fold inputs);
        p3 stores the digest layer bit-reversed (with the matching row
        permutation)."""
        n = len(state)
        half = n // arity  # leaf count
        params = getattr(self.hasher, "params", None)
        if self.native or self.native_kc:
            cols = np.stack(
                [state[k * half : (k + 1) * half] for k in range(arity)]
            )  # (arity, half, 4)
            if self.native:
                d = ne.hash_columns(cols, params)
            else:
                d = ne.kc_hash_columns(cols)
            halves_dev = jnp.asarray(
                ne.u64_to_planes(ne.to_mont(np.asarray(state)))
            ).reshape(NUM_LIMBS, arity, half)
            if bit_reverse and half > 1:
                d = d[_bitrev_table(half)]
            if half > 1:
                tl = (ne.tree_levels(d, params) if self.native
                      else ne.kc_tree_levels(d))
            else:
                tl = []
            ups = [d] + tl
            levels = [
                jnp.asarray(ne.u64_to_planes(ne.to_mont(l))) for l in ups
            ]
            root = ne.u64_to_ints(ups[-1][-1:])[0]
        elif self.native_field:
            # engine exists but unknown hasher: field ops native, hashing
            # scalar over ints
            ints = ne.u64_to_ints(state)
            rows = [
                [ints[k * half + j] for k in range(arity)]
                for j in range(half)
            ]
            d = np.array(
                [self.hasher.hash_ints(r) for r in rows], dtype=object
            )
            halves_dev = jnp.asarray(
                fr.pack_ints(ints)
            ).reshape(NUM_LIMBS, arity, half)
            if bit_reverse and half > 1:
                d = d[_bitrev_table(half)]
            lv = [d]
            cur = d
            while len(cur) > 1:
                cur = np.array(
                    [
                        self.hasher.compress_ints(
                            int(cur[2 * i]), int(cur[2 * i + 1])
                        )
                        for i in range(len(cur) // 2)
                    ],
                    dtype=object,
                )
                lv.append(cur)
            levels = [
                jnp.asarray(fr.pack_ints([int(v) for v in l])) for l in lv
            ]
            root = int(lv[-1][0])
        else:
            from ..hash import np_poseidon2 as npp

            if arity == 2 and isinstance(self.hasher, Poseidon2Hasher):
                d = npp.compress_vec(state[:half], state[half:], params)
            else:
                d = np.array(
                    [
                        self.hasher.hash_ints(
                            [int(state[k * half + j]) for k in range(arity)]
                        )
                        for j in range(half)
                    ],
                    dtype=object,
                )
            halves_dev = jnp.asarray(
                fr.pack_ints([int(v) for v in state])
            ).reshape(NUM_LIMBS, arity, half)
            if bit_reverse and half > 1:
                d = d[_bitrev_table(half)]
            if isinstance(self.hasher, Poseidon2Hasher):
                lv = npp.tree_levels_vec(d, params)
            else:
                lv = [d]
                cur = d
                while len(cur) > 1:
                    cur = np.array(
                        [
                            self.hasher.compress_ints(
                                int(cur[2 * i]), int(cur[2 * i + 1])
                            )
                            for i in range(len(cur) // 2)
                        ],
                        dtype=object,
                    )
                    lv.append(cur)
            levels = [
                jnp.asarray(fr.pack_ints([int(v) for v in l])) for l in lv
            ]
            root = int(lv[-1][0])
        tree = mmcs.MerkleTree(
            [halves_dev], [0], levels, self.hasher, None,
            row_perm=_bitrev_table(half) if bit_reverse else None,
            root_cache=root,
        )
        return tree, root


def _interpolate_host(evals: list, shift_int: int) -> list:
    """Coefficients of the polynomial with these evals on shift·H (naive
    O(m²) inverse DFT — m is the tiny final codeword)."""
    m = len(evals)
    w_inv = oracle.inv(pow(root_of_unity(m.bit_length() - 1), 1, R_MOD))
    m_inv = oracle.inv(m)
    s_inv = oracle.inv(shift_int % R_MOD)
    coeffs = []
    for d in range(m):
        acc = 0
        for j in range(m):
            acc = oracle.add(acc, oracle.mul(evals[j], pow(w_inv, j * d, R_MOD)))
        coeffs.append(oracle.mul(oracle.mul(acc, m_inv), pow(s_inv, d, R_MOD)))
    return coeffs
