"""Trace aggregation: gadget traces -> one wide device-resident table.

Equivalent of ``RawTrace`` (trace/src/lib.rs:17-106): compute the global max
height, zero-pad every gadget trace to it (and to a power of two — required
by the two-adic domains; zero rows satisfy both gadgets neutrally, SURVEY.md
§5.9.4), build each gadget's generated columns on device, and concatenate
column blocks with index-shifted configs.

The assembled trace lives as a single (16, W_total, H) uint32 limb array in
Montgomery form — the natural device layout (rows in lanes), in contrast to
the reference's row-major interleave (trace/src/lib.rs:94-106) which exists
only to satisfy its CPU matrix type.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..air.gadgets import LineaAir
from ..field import fr
from ..field.codec import decode_be_bytes_mod_order
from . import builders
from .loader import RawLookupTrace, RawPermutationTrace


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 0).bit_length() if n > 1 else 1


def _decode(col_bytes: np.ndarray) -> np.ndarray:
    return decode_be_bytes_mod_order(col_bytes)


@dataclass
class BuiltTrace:
    matrix: jnp.ndarray      # (16, W_total, H) Montgomery limbs
    air: LineaAir
    height: int


def build_trace(
    permutations: list,
    lookups: list,
    alpha: int,
    delta: int,
    check: bool = True,
) -> BuiltTrace:
    """Assemble the full trace from raw gadget traces.

    ``alpha``/``delta`` are the public challenges (drawn by the driver before
    commitment, exactly as bin/src/main.rs:29-35 — see SURVEY.md §5.9.1).
    ``check`` enforces the reference's self-check asserts
    (permutation check column ends at 1, lookup at 0).
    """
    heights = [t.get_max_height() for t in permutations + lookups]
    assert heights, "no traces"
    height = _next_pow2(max(heights))

    alpha_d = jnp.asarray(fr.pack_ints([alpha]))[:, 0]
    delta_d = jnp.asarray(fr.pack_ints([delta]))[:, 0]

    blocks = []
    configs = []
    offset = 0

    for lt in lookups:
        lt = RawLookupTrace(
            a=list(lt.a), b=[list(t) for t in lt.b], name=lt.name,
            a_filter=lt.a_filter, b_filter=list(lt.b_filter),
        )
        lt.resize(height)
        a = jnp.stack([jnp.asarray(_decode(c)) for c in lt.a], axis=1)
        b_tables = [
            jnp.stack([jnp.asarray(_decode(c)) for c in tbl], axis=1)
            for tbl in lt.b
        ]
        a_filter = jnp.asarray(_decode(lt.a_filter))
        b_filters = [jnp.asarray(_decode(f)) for f in lt.b_filter]
        cols, cfg = builders.build_lookup_columns(
            a, b_tables, a_filter, b_filters, alpha_d, delta_d
        )
        if check:
            last = fr.unpack_ints(np.asarray(cols[:, cfg.check_id, -1:]))[0]
            assert last == 0, (
                "failed to check constrain: check column should be 0 on the last row"
            )
        blocks.append(cols)
        configs.append(cfg.shift(offset))
        offset += cfg.width

    for pt in permutations:
        pt = RawPermutationTrace(a=list(pt.a), b=list(pt.b), name=pt.name)
        pt.resize(height)
        a = jnp.stack([jnp.asarray(_decode(c)) for c in pt.a], axis=1)
        b = jnp.stack([jnp.asarray(_decode(c)) for c in pt.b], axis=1)
        cols, cfg = builders.build_permutation_columns(a, b, alpha_d, delta_d)
        if check:
            last = fr.unpack_ints(np.asarray(cols[:, cfg.check_id, -1:]))[0]
            assert last == 1, (
                "failed to check constrain: check column should be 1 on the last row"
            )
        blocks.append(cols)
        configs.append(cfg.shift(offset))
        offset += cfg.width

    matrix = jnp.concatenate(blocks, axis=1)
    return BuiltTrace(matrix=matrix, air=LineaAir(tuple(configs)), height=height)
