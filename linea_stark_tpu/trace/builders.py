"""Device-resident trace column builders.

TPU-native re-design of the reference's host-side trace generation
(trace/src/permutation.rs:24-93, trace/src/lookup.rs:46-176 — SURVEY.md §3.2
marks the per-row field inversions and sequential prefix scans as host hot
loop #1):

* Horner row compression: W vectorized multiplies over all N rows at once.
* Per-row inversions -> one :func:`fr.batch_inverse` (Montgomery's trick via
  two parallel prefix-product scans).
* Running product / log-derivative sum -> ``jax.lax.associative_scan``.
* The lookup multiplicity HashMap (trace/src/lookup.rs:79-102,147-159) does
  not vectorize, so it is replaced by an exact sort-based multiset join: a
  16-pass LSD radix argsort over the 256-bit row-compression values groups
  equal values into segments; filtered-A occurrence counts are a segment-sum,
  and the reference's "count consumed once at the first filtered B match
  (row-major, then table order)" rule becomes a segment-min over flattened
  B positions.  Multiplicity columns are bit-identical to the sequential
  semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import fr_ops as fo
from ..air.gadgets import LookupAirConfig, PermutationAirConfig
from ..field import fr
from ..field.constants import LIMB_MASK, NUM_LIMBS

U32 = jnp.uint32


def horner_columns(matrix: jax.Array, alpha: jax.Array) -> jax.Array:
    """(16, W, N) columns -> (16, N) row compression Σ col_j·α^{W-1-j}."""
    acc = fr.zeros(matrix.shape[2:])
    for w in range(matrix.shape[1]):
        acc = fo.add(fo.mul(acc, alpha), matrix[:, w])
    return acc


def counts_to_field(counts: jax.Array) -> jax.Array:
    """uint32 counts (N,) -> Montgomery field elements (16, N)."""
    limbs = [counts & U32(LIMB_MASK), counts >> 16] + [jnp.zeros_like(counts)] * (
        NUM_LIMBS - 2
    )
    return fo.to_mont(jnp.stack(limbs, axis=0))


def radix_argsort(vals: jax.Array) -> jax.Array:
    """Stable ascending argsort of (16, K) limb-stacked 256-bit keys.

    Eight LSD passes over packed 32-bit digits (two 16-bit limbs per pass);
    each pass is one stable u32 argsort — the composition sorts the full
    256-bit value.
    """
    k = vals.shape[-1]
    perm = jnp.arange(k, dtype=jnp.int32)
    for w in range(NUM_LIMBS // 2):
        key = vals[2 * w] | (vals[2 * w + 1] << 16)
        keyp = jnp.take(key, perm)
        order = jnp.argsort(keyp, stable=True)
        perm = jnp.take(perm, order)
    return perm


# ---------------------------------------------------------------------------
# Permutation gadget (trace/src/permutation.rs:24-93)
# ---------------------------------------------------------------------------

@jax.jit
def _perm_cols(a: jax.Array, b: jax.Array, alpha: jax.Array, delta: jax.Array):
    """Whole permutation-column build as ONE compiled program (the eager
    op-by-op form paid one remote-dispatch round trip per op — ~80 of them —
    and one compile-RPC per distinct op/shape)."""
    a_comb = horner_columns(a, alpha)
    b_comb = horner_columns(b, alpha)
    b_inv = fo.batch_inverse(fo.add(b_comb, delta))
    ratio = fo.mul(fo.add(a_comb, delta), b_inv)
    check = fo.prefix_product(ratio)
    return jnp.concatenate([a, b, b_inv[:, None], check[:, None]], axis=1)


def build_permutation_columns(a: jax.Array, b: jax.Array, alpha: jax.Array, delta: jax.Array):
    """a, b: (16, W, N) column matrices.  Returns (16, 2W+2, N) trace columns
    [a..., b..., b_inverse, check] and the (unshifted) PermutationAirConfig.
    """
    w = a.shape[1]
    assert b.shape[1] == w
    cols = _perm_cols(a, b, alpha, delta)
    cfg = PermutationAirConfig(
        a_columns_ids=tuple(range(w)),
        b_columns_ids=tuple(range(w, 2 * w)),
        b_inverse_id=2 * w,
        check_id=2 * w + 1,
    )
    return cols, cfg


# ---------------------------------------------------------------------------
# Lookup gadget (trace/src/lookup.rs:46-214)
# ---------------------------------------------------------------------------

def lookup_multiplicities(
    a_comb: jax.Array,
    a_filter_nz: jax.Array,
    b_comb_flat: jax.Array,
    b_filter_nz_flat: jax.Array,
) -> jax.Array:
    """Exact replacement for the occurrence HashMap.

    a_comb: (16, N); a_filter_nz: (N,) bool; b_comb_flat: (16, M) with
    M = N·T flattened row-major over (row, table); b_filter_nz_flat: (M,).
    Returns uint32 multiplicities (M,): the filtered-A occurrence count at
    the first filtered B position of each value, zero elsewhere.
    """
    n = a_comb.shape[-1]
    m = b_comb_flat.shape[-1]
    total = n + m
    vals = jnp.concatenate([a_comb, b_comb_flat], axis=-1)
    perm = radix_argsort(vals)
    svals = jnp.take(vals, perm, axis=-1)
    boundary = jnp.concatenate(
        [
            jnp.ones((1,), dtype=jnp.int32),
            jnp.any(svals[:, 1:] != svals[:, :-1], axis=0).astype(jnp.int32),
        ]
    )
    seg = jnp.cumsum(boundary) - 1  # (total,)

    is_a = perm < n
    a_weight = jnp.where(is_a & jnp.take(a_filter_nz, jnp.minimum(perm, n - 1)), 1, 0)
    count_per_seg = jax.ops.segment_sum(
        a_weight.astype(U32), seg, num_segments=total
    )

    b_pos = perm - n  # valid where ~is_a
    b_pos_safe = jnp.clip(b_pos, 0, m - 1)
    candidate = (~is_a) & jnp.take(b_filter_nz_flat, b_pos_safe)
    big = jnp.int32(total + 1)
    first_per_seg = jax.ops.segment_min(
        jnp.where(candidate, b_pos.astype(jnp.int32), big), seg, num_segments=total
    )
    winner = candidate & (b_pos.astype(jnp.int32) == jnp.take(first_per_seg, seg))
    mult_sorted = jnp.where(winner, jnp.take(count_per_seg, seg), U32(0))

    out_all = jnp.zeros((total,), dtype=U32).at[perm].set(mult_sorted)
    return out_all[n:]


@jax.jit
def _lookup_cols(
    a: jax.Array,
    b_tables: tuple,
    a_filter: jax.Array,
    b_filters: tuple,
    alpha: jax.Array,
    delta: jax.Array,
):
    """Whole lookup-column build (incl. the sort-join multiplicity pass) as
    one compiled program; see :func:`_perm_cols` for why."""
    n = a.shape[-1]
    t = len(b_tables)

    a_comb = horner_columns(a, alpha)
    b_combs = [horner_columns(bt, alpha) for bt in b_tables]

    a_inv = fo.batch_inverse(fo.add(a_comb, delta))
    # batch all B-table inversions in one scan
    b_chal = jnp.stack([fo.add(c, delta) for c in b_combs], axis=1)  # (16, T, N)
    b_inv = fo.batch_inverse(b_chal.reshape(NUM_LIMBS, t * n)).reshape(
        NUM_LIMBS, t, n
    )

    a_f_nz = ~fr.is_zero(a_filter)
    b_f_nz = [~fr.is_zero(f) for f in b_filters]

    # Flatten B entries row-major over (row, table): p = i·T + t — the order
    # in which the reference consumes occurrence counts
    # (trace/src/lookup.rs:118-163: rows outer, tables inner).
    b_comb_flat = (
        jnp.stack(b_combs, axis=1).transpose(0, 2, 1).reshape(NUM_LIMBS, n * t)
    )
    b_f_flat = jnp.stack(b_f_nz, axis=0).transpose(1, 0).reshape(n * t)

    mult_flat = lookup_multiplicities(a_comb, a_f_nz, b_comb_flat, b_f_flat)
    mult = mult_flat.reshape(n, t).transpose(1, 0)  # (T, N)
    occ = [counts_to_field(mult[i]) for i in range(t)]

    # check column: prefix sum of filter_a·a_inv − Σ_t filter_b·occ·b_inv.
    # (With 0/1 filters this matches the reference's conditional adds,
    # trace/src/lookup.rs:133-162, and is exactly what the AIR constrains.)
    term = fo.mul(a_filter, a_inv)
    for i in range(t):
        term = fo.sub(term, fo.mul(fo.mul(b_filters[i], occ[i]), b_inv[:, i]))
    check = fo.prefix_sum(term)

    return jnp.concatenate(
        [a]
        + [bt for bt in b_tables]
        + [a_filter[:, None]]
        + [f[:, None] for f in b_filters]
        + [a_inv[:, None]]
        + [b_inv[:, i : i + 1] for i in range(t)]
        + [o[:, None] for o in occ]
        + [check[:, None]],
        axis=1,
    )


def build_lookup_columns(
    a: jax.Array,
    b_tables: list,
    a_filter: jax.Array,
    b_filters: list,
    alpha: jax.Array,
    delta: jax.Array,
):
    """a: (16, Wa, N); b_tables: list of (16, Wb, N); a_filter: (16, N);
    b_filters: list of (16, N).  Returns trace columns (16, width, N) in the
    reference layout [a, b..., a_filter, b_filters, a_inv, b_invs, occs,
    check] and the unshifted LookupAirConfig
    (trace/src/lookup.rs:171-176,178-214)."""
    t = len(b_tables)
    wa, wb = a.shape[1], b_tables[0].shape[1]
    cols = _lookup_cols(
        a, tuple(b_tables), a_filter, tuple(b_filters), alpha, delta
    )

    a_ids = tuple(range(wa))
    b_ids = tuple(
        tuple(wa + ti * wb + j for j in range(wb)) for ti in range(t)
    )
    a_filter_id = wa + t * wb
    b_filter_id = tuple(a_filter_id + 1 + i for i in range(t))
    a_inverses_id = b_filter_id[-1] + 1
    b_inverses_id = tuple(a_inverses_id + 1 + i for i in range(t))
    occurrences_id = tuple(b_inverses_id[-1] + 1 + i for i in range(t))
    check_id = occurrences_id[-1] + 1
    cfg = LookupAirConfig(
        a_columns_ids=a_ids,
        b_columns_ids=b_ids,
        a_filter_id=a_filter_id,
        b_filter_id=b_filter_id,
        a_inverses_id=a_inverses_id,
        b_inverses_id=b_inverses_id,
        occurrences_id=occurrences_id,
        check_id=check_id,
    )
    return cols, cfg
