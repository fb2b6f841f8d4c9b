"""NTT tests against a naive O(N^2) DFT oracle (Python ints)."""

import random

import numpy as np
import jax.numpy as jnp

from linea_stark_tpu.field import fr, oracle
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.ntt import (
    bit_reverse_indices,
    coset_lde,
    intt,
    ntt,
    ntt_dif,
    ntt_dit,
    root_of_unity,
)

rng = random.Random(7)


def naive_dft(vals, w):
    n = len(vals)
    return [
        sum(vals[j] * pow(w, j * k, R_MOD) for j in range(n)) % R_MOD
        for k in range(n)
    ]


def naive_poly_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R_MOD
    return acc


def to_dev(vals):
    return jnp.asarray(fr.pack_ints(vals))


def from_dev(arr):
    return fr.unpack_ints(np.asarray(arr))


def test_ntt_matches_naive():
    for log_n in (0, 1, 3, 5):
        n = 1 << log_n
        vals = [rng.randrange(R_MOD) for _ in range(n)]
        w = root_of_unity(log_n)
        assert from_dev(ntt(to_dev(vals))) == naive_dft(vals, w)


def test_intt_round_trip():
    n = 32
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    assert from_dev(intt(ntt(to_dev(vals)))) == vals


def test_dif_is_bitrev_of_ntt():
    n = 16
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    rev = bit_reverse_indices(n)
    full = from_dev(ntt(to_dev(vals)))
    dif = from_dev(ntt_dif(to_dev(vals)))
    assert [dif[rev[i]] for i in range(n)] == full


def test_dit_consumes_bitrev():
    n = 16
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    rev = bit_reverse_indices(n)
    x = to_dev(vals)
    assert from_dev(ntt_dit(jnp.take(x, jnp.asarray(rev), axis=-1))) == from_dev(ntt(x))


def test_batched_ntt():
    n, w_cols = 8, 3
    cols = [[rng.randrange(R_MOD) for _ in range(n)] for _ in range(w_cols)]
    flat = [v for col in cols for v in col]
    x = to_dev(flat).reshape(16, w_cols, n)
    out = from_dev(ntt(x).reshape(16, w_cols * n))
    w = root_of_unity(3)
    expect = [v for col in cols for v in naive_dft(col, w)]
    assert out == expect


def test_coset_lde_extends_evaluations():
    """LDE output must equal evaluating the interpolant on the shifted big domain."""
    log_n, added = 3, 2
    n = 1 << log_n
    shift = 22
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    w_small = root_of_unity(log_n)
    evals = [naive_poly_eval(coeffs, pow(w_small, i, R_MOD)) for i in range(n)]

    big_n = n << added
    w_big = root_of_unity(log_n + added)
    expect = [
        naive_poly_eval(coeffs, shift * pow(w_big, i, R_MOD) % R_MOD)
        for i in range(big_n)
    ]
    got = from_dev(coset_lde(to_dev(evals), added, shift))
    assert got == expect


def test_coset_lde_from_source_coset():
    """Round-trip: evals on coset c·H -> LDE onto shift·H_big."""
    log_n, added = 3, 1
    n = 1 << log_n
    src_shift, shift = 5, 22
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    w_small = root_of_unity(log_n)
    evals = [
        naive_poly_eval(coeffs, src_shift * pow(w_small, i, R_MOD) % R_MOD)
        for i in range(n)
    ]
    big_n = n << added
    w_big = root_of_unity(log_n + added)
    expect = [
        naive_poly_eval(coeffs, shift * pow(w_big, i, R_MOD) % R_MOD)
        for i in range(big_n)
    ]
    got = from_dev(coset_lde(to_dev(evals), added, shift, src_shift_int=src_shift))
    assert got == expect
