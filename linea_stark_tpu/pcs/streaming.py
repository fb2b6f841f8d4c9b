"""Streamed trace commitment: prove heights whose LDE exceeds HBM.

The 2^22-row × blowup-4 config's trace LDE is 8 cols × 2^24 × 64 B
= 8.6 GB; materializing it alongside the quotient stack, Merkle levels and
FRI codeword exceeds the single chip's 15.7 GB HBM (round-4
BENCH_MATRIX.md row 6: "XLA peak 24 GB").  Long-trace scaling is this
framework's reason to exist (SURVEY.md §5.7), so the single-chip path must
degrade gracefully: **retain only the coefficient form** (16, W, n) — a
blowup× smaller array — and re-derive LDE *column groups* on demand:

* commit: derive groups, absorb them through the rate-2 sponge chain
  (only the 3 carry words persist between groups), release the planes;
* open: one program per group computes the barycentric block partials and
  the reduced-codeword partial sums against the retained denominators;
* query phase: one program per group re-derives the evals and gathers just
  the opened rows.

The extra cost is one additional forward-NTT sweep of the trace per prove
phase that re-derives (commit, open, query) — ~3 sweeps instead of 1 —
traded for an 8.6 GB resident-set cut.  The reference has no answer at all
at this height (its 2^19 run already takes 330 s / 3 GB on 24 cores;
trace/src/lib.rs:94-106 materializes everything).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import fr_ops as fo
from ..field import fr
from ..field.constants import NUM_LIMBS, R_MOD
from ..ntt.ntt import (
    _coset_scale,
    coeffs_to_evals,
    evals_to_coeffs,
    ntt,
    pad_coeffs,
    root_of_unity,
)
from ..utils.export_cache import export_cached_jit

# Streaming engages when the full LDE would exceed this many bytes
# (64 B/element).  ~4 GB keeps the 2^19-blowup-8 headline (2.1 GB) on the
# fast materialized path and streams anything larger.
import os

STREAM_LDE_BYTES = int(os.environ.get("LINEA_STREAM_LDE_BYTES", 4 << 30))
# Quotient chunk stacks stream above this (they retain alongside the trace
# state, so their budget is tighter).
STREAM_CHUNK_BYTES = int(os.environ.get("LINEA_STREAM_CHUNK_BYTES", 1 << 31))


def want_streaming(w: int, n_lde: int) -> bool:
    return w * n_lde * 64 > STREAM_LDE_BYTES


def want_chunk_streaming(b: int, n_lde: int) -> bool:
    return b * n_lde * 64 >= STREAM_CHUNK_BYTES


@export_cached_jit(name="trace_coeffs")
def _coeffs_jit(trace):
    """(16, W, n) evals on H_n -> natural-order coefficients (iNTT + 1/n)."""
    return evals_to_coeffs(trace)


@export_cached_jit(name="group_evals", static_argnames=("log_blowup", "shift"))
def _group_evals_jit(coeffs_g, log_blowup: int, shift: int):
    """(16, g, n) coefficients -> (16, g, n·blowup) evals on shift·H_lde."""
    return coeffs_to_evals(pad_coeffs(coeffs_g, log_blowup), shift)


@export_cached_jit(name="group_rows", static_argnames=("log_blowup", "shift"))
def _group_rows_jit(coeffs_g, idx, log_blowup: int, shift: int):
    """Re-derive a group's evals and gather rows ``idx`` -> (16, g, Q)."""
    evals = coeffs_to_evals(pad_coeffs(coeffs_g, log_blowup), shift)
    return jnp.take(evals, idx, axis=-1)


@export_cached_jit(name="coset_evals", static_argnames=("shift_i",))
def _coset_evals_jit(coeffs, shift_i: int):
    """(16, W, n) coefficients -> evals on shift_i·H_n (same size — the
    quotient path's per-coset trace view)."""
    return coeffs_to_evals(coeffs, shift_i)


@dataclass
class LazyLde:
    """Trace LDE in coefficient form; LDE column groups derived on demand.

    Duck-types the pieces of a materialized (16, W, n_lde) array that the
    commit/open/query code touches (``shape``, ``shape[1]``), everything
    else goes through :meth:`group_evals` / :meth:`gather_rows`."""

    coeffs: jax.Array      # (16, W, n) natural coefficients
    log_blowup: int
    shift: int
    group: int             # columns per derived group (kept EVEN so the
                           # rate-2 absorb chain never straddles a boundary
                           # mid-permutation)

    @property
    def shape(self):
        return (
            NUM_LIMBS,
            self.coeffs.shape[1],
            self.coeffs.shape[-1] << self.log_blowup,
        )

    # distinguishes a lazy matrix from a materialized uint32 array of the
    # same logical shape in shape/dtype-keyed caches (utils/export_cache.py)
    dtype = "lazy_lde_uint32"

    @property
    def width(self) -> int:
        return self.coeffs.shape[1]

    def groups(self):
        w = self.width
        for c0 in range(0, w, self.group):
            yield c0, min(c0 + self.group, w)

    def group_evals(self, c0: int, c1: int) -> jax.Array:
        return _group_evals_jit(
            self.coeffs[:, c0:c1], self.log_blowup, self.shift
        )

    def coset_evals(self, coset_index: int) -> jax.Array:
        """Full-width trace evals on coset shift·ω_lde^i·H_n (size n, not
        n_lde — what the quotient evaluation consumes).  Derived per
        column group with optimization barriers between groups, so the
        transform transients never coexist (works traced and eager)."""
        n_lde = self.coeffs.shape[-1] << self.log_blowup
        omega_lde = root_of_unity(n_lde.bit_length() - 1)
        shift_i = (self.shift * pow(omega_lde, coset_index, R_MOD)) % R_MOD
        parts = []
        for c0, c1 in self.groups():
            cc = self.coeffs[:, c0:c1]
            if parts:
                cc = jax.lax.optimization_barrier((cc, parts[-1]))[0]
            parts.append(_coset_evals_jit(cc, shift_i))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    def gather_rows(self, indices) -> jax.Array:
        """(16, W, Q) opened rows at ``indices`` (device array).  One
        COLUMN per derive program — by the query phase the retained set
        (coefficients, digest levels, fold trees) leaves no room for a
        multi-column transform."""
        idx = jnp.asarray(np.asarray(indices, dtype=np.int32))
        parts = []
        for c0 in range(self.width):
            parts.append(
                hard_sync(
                    _group_rows_jit(
                        self.coeffs[:, c0 : c0 + 1], idx, self.log_blowup,
                        self.shift,
                    )
                )
            )
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _lazy_flatten(l: LazyLde):
    return (l.coeffs,), (l.log_blowup, l.shift, l.group)


def _lazy_unflatten(aux, children):
    return LazyLde(children[0], *aux)


jax.tree_util.register_pytree_node(LazyLde, _lazy_flatten, _lazy_unflatten)

try:  # let jax.export serialize programs taking a LazyLde (export cache)
    import json as _json

    jax.export.register_pytree_node_serialization(
        LazyLde,
        serialized_name="linea_stark_tpu.pcs.streaming.LazyLde",
        serialize_auxdata=lambda aux: _json.dumps(list(aux)).encode(),
        deserialize_auxdata=lambda b: tuple(_json.loads(bytes(b))),
    )
except Exception:  # older jax: the export cache falls back to plain jit
    pass


def hard_sync(x):
    """True barrier on the remote (axon) runtime — ``block_until_ready``
    returns before execution completes there, so a 1-element fetch is the
    only reliable sync.  Used between streamed-height phases: without it
    the next multi-GB program's workspace is allocated while the previous
    one is still executing, and the two peaks together exhaust HBM."""
    np.asarray(x[(slice(0, 1),) * x.ndim])
    return x


def default_group(n_lde: int) -> int:
    """Columns per derived group: bytes ≈ g · n_lde · 64 ≤ ~1 GB (the
    derive program additionally holds ~3 group-sized NTT stage buffers);
    kept even so the rate-2 sponge chain never straddles a boundary
    mid-permutation."""
    return max(2, (1 << 24) // n_lde * 2)


def make_lazy_lde(trace: jax.Array, log_blowup: int, shift: int) -> LazyLde:
    n_lde = trace.shape[-1] << log_blowup
    return LazyLde(
        hard_sync(_coeffs_jit(trace)), log_blowup, shift,
        default_group(n_lde),
    )


# ---------------------------------------------------------------------------
# Streamed commit: absorb groups through the sponge chain
# ---------------------------------------------------------------------------


def streamed_leaf_digests(lazy: LazyLde, params) -> jax.Array:
    """(16, n_lde) leaf digests of the lazy matrix via the rate-2 overwrite
    absorb, carrying only (s0, s1, s2) between groups."""
    from ..backend import use_pallas

    if use_pallas():
        from ..kernels import pallas_poseidon2 as pk

        perm2 = lambda a, b: pk.permute2(a, b, params)
        perm = lambda a, b, c: pk.permute(a, b, c, params)
    else:
        from ..hash import poseidon2 as p2

        perm2 = lambda a, b: p2.permute(a, b, fr.zeros(a.shape[1:]), params)
        perm = lambda a, b, c: p2.permute(a, b, c, params)

    state = None
    for c0, c1 in lazy.groups():
        evals = lazy.group_evals(c0, c1)
        cols = [evals[:, i] for i in range(c1 - c0)]
        del evals
        i = 0
        while i < len(cols):
            a, b = cols[i], cols[i + 1] if i + 1 < len(cols) else None
            if state is None:
                assert b is not None, "group sizes are even"
                state = perm2(a, b)
            elif b is not None:
                state = perm(a, b, state[2])
            else:  # odd total width tail (last group only)
                state = perm(a, state[1], state[2])
            i += 2
        cols = None
        hard_sync(state[0])  # one group's derive+absorb in flight at a time
    return state[0]


# ---------------------------------------------------------------------------
# Streamed open: per-group barycentric partials + reduced-codeword partials
# ---------------------------------------------------------------------------


@export_cached_jit(name="open_denom_single",
                   static_argnames=("omega", "shift", "n"))
def _denom_single_jit(z_s, omega: int, shift: int, n: int):
    """(16, n) inverses of (z−x) over x = shift·ω^i — ONE opening point per
    program, domain vector built in-program (the two-point stacked version
    plus a retained x_vec broke the streamed heights' HBM budget)."""
    x_vec = fo.mul_const(fo.powers(omega, n), shift)
    zb = jnp.broadcast_to(z_s[:, None], x_vec.shape)
    return fo.batch_inverse(fo.sub(zb, x_vec))


def _block_sums(mat, u):
    """Σ_j mat[:, c, j]·u[:, j] per column, as (16, W, 128) raw Montgomery
    block partials (the host finishes the 128-way adds mod r — any block
    partition sums to the same total)."""
    from ..backend import use_pallas

    if use_pallas():
        from ..kernels import pallas_field as pf

        return pf.weighted_block_sums_128(mat, u)
    prod = fr.mul(mat, u[:, None, :])
    n = prod.shape[-1]
    prod = prod.reshape(NUM_LIMBS, prod.shape[1], n // 128, 128)
    while prod.shape[2] > 1:
        half = prod.shape[2] // 2
        prod = fr.add(prod[:, :, :half], prod[:, :, half:])
    return prod[:, :, 0]


@export_cached_jit(name="group_open_partials",
                   static_argnames=("log_blowup", "shift", "omega"))
def _group_open_partials_jit(coeffs_g, di0, di1, log_blowup: int,
                             shift: int, omega: int):
    """Derive a group's evals and return its barycentric block partials
    (pa, pb) = Σ p(x)·x/(ζ−x), Σ p(x)·x/(ζg−x) as (16, g, 128) raw sums
    (domain vector x built in-program)."""
    evals = coeffs_to_evals(pad_coeffs(coeffs_g, log_blowup), shift)
    x_vec = fo.mul_const(fo.powers(omega, evals.shape[-1]), shift)
    u0 = fo.mul(x_vec, di0)
    u1 = fo.mul(x_vec, di1)
    return _block_sums(evals, u0), _block_sums(evals, u1)


@export_cached_jit(name="mat_open_partials",
                   static_argnames=("omega", "shift"))
def _mat_open_partials_jit(mat, di0, di1, omega: int, shift: int):
    """Barycentric block partials of a materialized (16, W, n_lde) matrix
    at both ζ and ζ·g: ((16, W, 128), (16, W, 128))."""
    x_vec = fo.mul_const(fo.powers(omega, mat.shape[-1]), shift)
    u0 = fo.mul(x_vec, di0)
    u1 = fo.mul(x_vec, di1)
    return _block_sums(mat, u0), _block_sums(mat, u1)


@export_cached_jit(name="chunk_reduce_partial")
def _chunk_reduce_partial_jit(chunk_stack, di0, kpow_c, gconst_c, f0_in):
    """Accumulate the chunk columns' contribution to the reduced codeword
    (they open at ζ only; kpow_c: (16, B), gconst_c: (16,))."""
    f0 = f0_in
    num = None
    for c in range(chunk_stack.shape[1]):
        t = fo.mul_scalar_arr(chunk_stack[:, c], kpow_c[:, c])
        num = t if num is None else fo.add(num, t)
    cb = jnp.broadcast_to(gconst_c[:, None], num.shape)
    num = fo.sub(num, cb)
    return fo.add(f0, fo.mul(num, di0))


@export_cached_jit(name="group_reduce_partial",
                   static_argnames=("log_blowup", "shift"))
def _group_reduce_partial_jit(coeffs_g, di0, di1, kpow_g, gconst_pair, f0_in,
                              log_blowup: int, shift: int):
    """Accumulate one group's contribution to the reduced codeword:

        f0 += Σ_c kpow_g[0][c]·col_c·di0 + Σ_c kpow_g[1][c]·col_c·di1
              − gconst_pair[0]·di0 − gconst_pair[1]·di1

    kpow_g: (16, 2, g) α' powers for (at-ζ, at-ζ·g) of this group's
    columns; gconst_pair: (16, 2) Σ kpow·y over this group's columns."""
    evals = coeffs_to_evals(pad_coeffs(coeffs_g, log_blowup), shift)
    f0 = f0_in
    for d_idx, di_d in ((0, di0), (1, di1)):
        num = None
        for c in range(evals.shape[1]):
            t = fo.mul_scalar_arr(evals[:, c], kpow_g[:, d_idx, c])
            num = t if num is None else fo.add(num, t)
        cb = jnp.broadcast_to(gconst_pair[:, d_idx][:, None], num.shape)
        num = fo.sub(num, cb)
        f0 = fo.add(f0, fo.mul(num, di_d))
    return f0
