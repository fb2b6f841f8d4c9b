"""Trace builders + AIR gadgets: constraints vanish, multiplicities exact."""

import numpy as np
import jax.numpy as jnp

from linea_stark_tpu.air import LineaAir, ScalarAlgebra, Sel, VectorAlgebra
from linea_stark_tpu.field import fr, oracle
from linea_stark_tpu.field.codec import decode_be_bytes_mod_order
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.trace import (
    build_trace,
    gen_lookup_trace,
    gen_permutation_trace,
)

ALPHA = 0x1234567890ABCDEF1234
DELTA = 0xFEDCBA09876543210FED


def as_int_matrix(mat):
    """(16, W, N) -> [[int]] canonical, indexed [w][n]."""
    w = mat.shape[1]
    return [fr.unpack_ints(np.asarray(mat[:, i])) for i in range(w)]


def eval_constraints_scalar(air, cols, alpha, delta, n):
    """Evaluate each constraint at every row (scalar backend) and check the
    selector semantics: EVERY rows all zero, FIRST at row 0, TRANSITION on
    rows 0..n-2, LAST at row n-1."""
    alg = ScalarAlgebra()
    for row in range(n):
        nxt_row = (row + 1) % n
        local = lambda i: cols[i][row]
        nxt = lambda i: cols[i][nxt_row]
        for sel, val in air.eval(local, nxt, alpha, delta, alg):
            if sel == Sel.EVERY:
                assert val == 0, f"EVERY failed at row {row}"
            elif sel == Sel.FIRST and row == 0:
                assert val == 0, "FIRST failed"
            elif sel == Sel.TRANSITION and row < n - 1:
                assert val == 0, f"TRANSITION failed at row {row}"
            elif sel == Sel.LAST and row == n - 1:
                assert val == 0, "LAST failed"


def test_permutation_trace_satisfies_air():
    raw = gen_permutation_trace(width=3, height=8, seed=1)
    built = build_trace([raw], [], ALPHA, DELTA)
    assert built.height == 8
    assert built.air.width == built.matrix.shape[1] == 3 * 2 + 2
    cols = as_int_matrix(built.matrix)
    # check column ends at 1
    cfg = built.air.configs[0]
    assert cols[cfg.check_id][-1] == 1
    eval_constraints_scalar(built.air, cols, ALPHA, DELTA, 8)


def test_permutation_padding_to_pow2():
    raw = gen_permutation_trace(width=2, height=6, seed=2)
    built = build_trace([raw], [], ALPHA, DELTA)
    assert built.height == 8
    cols = as_int_matrix(built.matrix)
    eval_constraints_scalar(built.air, cols, ALPHA, DELTA, 8)


def test_lookup_trace_satisfies_air():
    raw = gen_lookup_trace(a_width=2, height=8, num_b_tables=2, seed=3)
    built = build_trace([], [raw], ALPHA, DELTA)
    cfg = built.air.configs[0]
    cols = as_int_matrix(built.matrix)
    assert cols[cfg.check_id][-1] == 0
    eval_constraints_scalar(built.air, cols, ALPHA, DELTA, 8)


def test_combined_lookup_and_permutation():
    perm = gen_permutation_trace(width=2, height=8, seed=4)
    look = gen_lookup_trace(a_width=2, height=4, num_b_tables=1, seed=5)
    built = build_trace([perm], [look], ALPHA, DELTA)
    assert built.height == 8
    assert len(built.air.configs) == 2
    cols = as_int_matrix(built.matrix)
    eval_constraints_scalar(built.air, cols, ALPHA, DELTA, 8)


def reference_multiplicities(a_rows, b_rows_flat, a_filter, b_filter_flat, alpha, delta):
    """Sequential mirror of trace/src/lookup.rs:79-163 (HashMap semantics)."""
    occurrences = {}
    for comb, f in zip(a_rows, a_filter):
        if f == 0:
            continue
        occurrences[comb] = occurrences.get(comb, 0) + 1
    mult = []
    for comb, f in zip(b_rows_flat, b_filter_flat):
        m = 0
        if comb in occurrences and f != 0:
            m = occurrences.pop(comb)
        mult.append(m)
    return mult


def test_multiplicities_match_sequential_reference():
    import random

    rng = random.Random(11)
    n, t = 16, 2
    # small value space to force collisions/multiplicities
    a_comb_int = [rng.randrange(5) + 100 for _ in range(n)]
    b_comb_int = [rng.randrange(5) + 100 for _ in range(n * t)]
    a_f = [rng.randrange(2) for _ in range(n)]
    b_f = [rng.randrange(2) for _ in range(n * t)]

    from linea_stark_tpu.trace.builders import lookup_multiplicities

    a_dev = jnp.asarray(fr.pack_ints(a_comb_int))
    b_dev = jnp.asarray(fr.pack_ints(b_comb_int))
    got = lookup_multiplicities(
        a_dev,
        jnp.asarray(np.array(a_f, dtype=bool)),
        b_dev,
        jnp.asarray(np.array(b_f, dtype=bool)),
    ).tolist()
    expect = reference_multiplicities(a_comb_int, b_comb_int, a_f, b_f, ALPHA, DELTA)
    assert got == expect


def test_cbor_round_trip(tmp_path):
    raw = gen_permutation_trace(width=2, height=4, seed=7)
    p = str(tmp_path / "perm.bin")
    raw.write_file(p)
    from linea_stark_tpu.trace import RawPermutationTrace

    back = RawPermutationTrace.read_file(p)
    assert back.name == raw.name
    for c1, c2 in zip(raw.a + raw.b, back.a + back.b):
        assert np.array_equal(c1, c2)


def test_cbor_lookup_round_trip(tmp_path):
    raw = gen_lookup_trace(a_width=2, height=4, num_b_tables=2, seed=8)
    p = str(tmp_path / "lookup.bin")
    raw.write_file(p)
    from linea_stark_tpu.trace import RawLookupTrace

    back = RawLookupTrace.read_file(p)
    for c1, c2 in zip(raw.a, back.a):
        assert np.array_equal(c1, c2)
    assert np.array_equal(raw.a_filter, back.a_filter)
