"""Sharded kernels on the 8-device CPU mesh vs single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linea_stark_tpu.dist import make_mesh, sharded_fold, sharded_merkle_root, sharded_ntt
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


@pytest.fixture(scope="module")
def mesh2():
    # CPU XLA compiles the SPMD-partitioned limb graphs slowly; a 2-device
    # mesh exercises the same collective code paths at tractable compile cost
    # (the 8-device case is covered by the driver's dryrun_multichip).
    return make_mesh(2)


def test_sharded_ntt_matches_local(mesh2):
    n, c = 16, 1
    vals = [rng.randrange(R_MOD) for _ in range(c * n)]
    x = to_dev(vals).reshape(16, c, n)
    expect = from_dev(ntt(x).reshape(16, c * n))
    got = from_dev(sharded_ntt(x, mesh2).reshape(16, c * n))
    assert got == expect


def test_sharded_ntt_inverse(mesh2):
    n = 16
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    x = to_dev(vals).reshape(16, 1, n)
    fwd = sharded_ntt(x, mesh2)
    back = sharded_ntt(fwd, mesh2, inverse=True)
    back = fr.mul_const(back, pow(n, R_MOD - 2, R_MOD))
    assert from_dev(back.reshape(16, n)) == vals


def test_sharded_merkle_root_matches_local(mesh2):
    w, n = 2, 16
    vals = [rng.randrange(R_MOD) for _ in range(w * n)]
    m = to_dev(vals).reshape(16, w, n)
    tree = commit([m])
    root = sharded_merkle_root(m, mesh2)
    assert from_dev(root.reshape(16, 1))[0] == tree.root_int()


def test_sharded_fold_matches_local(mesh8):
    n = 64
    shift, omega = 22, root_of_unity(6)
    beta = rng.randrange(R_MOD)
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    f = to_dev(vals)
    expect = from_dev(fold_codeword(f, beta, shift, omega))
    got = from_dev(sharded_fold(f, beta, shift, omega, mesh8))
    assert got == expect
