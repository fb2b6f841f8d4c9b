"""Sharded kernels on the 8-device CPU mesh vs single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # sharded CPU-mesh compiles exceed the fast-tier budget

from linea_stark_tpu.dist import make_mesh, sharded_fold, sharded_merkle_root, sharded_ntt
from linea_stark_tpu.dist.sharded import sharded_tree_levels
from linea_stark_tpu.field import fr
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.fri.fold import fold_codeword
from linea_stark_tpu.merkle import commit
from linea_stark_tpu.ntt import ntt, root_of_unity

import random

rng = random.Random(21)


def to_dev(vals):
    return jnp.asarray(fr.pack_ints(vals))


def from_dev(arr):
    return fr.unpack_ints(np.asarray(arr))


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_ntt_matches_local(mesh8):
    n, c = 64, 1
    vals = [rng.randrange(R_MOD) for _ in range(c * n)]
    x = to_dev(vals).reshape(16, c, n)
    expect = from_dev(ntt(x).reshape(16, c * n))
    got = from_dev(sharded_ntt(x, mesh8).reshape(16, c * n))
    assert got == expect


def test_sharded_ntt_inverse(mesh8):
    n = 64
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    x = to_dev(vals).reshape(16, 1, n)
    fwd = sharded_ntt(x, mesh8)
    back = sharded_ntt(fwd, mesh8, inverse=True)
    back = fr.mul_const(back, pow(n, R_MOD - 2, R_MOD))
    assert from_dev(back.reshape(16, n)) == vals


def test_sharded_merkle_root_matches_local(mesh8):
    w, n = 2, 32
    vals = [rng.randrange(R_MOD) for _ in range(w * n)]
    m = to_dev(vals).reshape(16, w, n)
    tree = commit([m])
    root = sharded_merkle_root(m, mesh8)
    assert from_dev(root.reshape(16, 1))[0] == tree.root_int()


def test_sharded_tree_levels_match_local(mesh8):
    w, n = 2, 32
    vals = [rng.randrange(R_MOD) for _ in range(w * n)]
    m = to_dev(vals).reshape(16, w, n)
    tree = commit([m])
    levels = sharded_tree_levels(m, mesh8)
    assert len(levels) == len(tree.levels)
    for got, want in zip(levels, tree.levels):
        assert from_dev(got) == from_dev(want)


def test_sharded_fold_matches_local(mesh8):
    n = 64
    shift, omega = 22, root_of_unity(6)
    beta = rng.randrange(R_MOD)
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    f = to_dev(vals)
    expect = from_dev(fold_codeword(f, beta, shift, omega))
    got = from_dev(sharded_fold(f, beta, shift, omega, mesh8))
    assert got == expect
    # device-scalar beta path (the real prover's)
    beta_arr = jnp.asarray(fr.pack_ints([beta]))[:, 0]
    got_arr = from_dev(sharded_fold(f, beta_arr, shift, omega, mesh8))
    assert got_arr == expect
