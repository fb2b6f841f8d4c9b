"""NTT tests against a naive O(N^2) DFT oracle (Python ints)."""

import random

import numpy as np
import jax.numpy as jnp

from linea_stark_tpu.field import fr, oracle
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.ntt import (
    coeffs_to_evals,
    coset_lde,
    evals_to_coeffs,
    intt,
    ntt,
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


def test_coeffs_evals_round_trip():
    n = 16
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    w = root_of_unity(4)
    evals = [naive_poly_eval(coeffs, pow(w, i, R_MOD)) for i in range(n)]
    assert from_dev(coeffs_to_evals(to_dev(coeffs))) == evals
    assert from_dev(evals_to_coeffs(to_dev(evals))) == coeffs


def test_coset_evals_round_trip():
    n, shift = 16, 5
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    w = root_of_unity(4)
    evals = [
        naive_poly_eval(coeffs, shift * pow(w, i, R_MOD) % R_MOD) for i in range(n)
    ]
    assert from_dev(coeffs_to_evals(to_dev(coeffs), shift)) == evals
    assert from_dev(evals_to_coeffs(to_dev(evals), shift)) == coeffs


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


import pytest


@pytest.mark.slow
def test_pallas_four_step_matches_xla():
    """The Pallas four-step path (interpret mode on CPU) agrees with XLA.

    Interpret-mode execution of the unrolled radix-4 kernel takes >10 min on
    CPU; marked slow (the TPU bench exercises the compiled kernel directly).
    """
    import os

    from linea_stark_tpu.kernels.pallas_ntt import ntt_pallas

    n = 1 << 8  # 2^4 x 2^4 four-step split
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    x = to_dev(vals)
    ref = ntt(x)  # CPU default backend = XLA
    got = ntt_pallas(x)
    assert from_dev(got) == from_dev(ref)
