"""Bit-exact tests of the limb field kernels against the Python-int oracle."""

import random

import numpy as np
import pytest

from linea_stark_tpu.field import constants as C
from linea_stark_tpu.field import fr, oracle
from linea_stark_tpu.field.codec import decode_be_bytes_mod_order, encode_be_bytes

rng = random.Random(0xA11CE)


def rand_vals(n):
    return [rng.randrange(C.R_MOD) for _ in range(n)]


def to_dev(vals, mont=True):
    import jax.numpy as jnp

    return jnp.asarray(fr.pack_ints(vals, mont=mont))


def check(arr, expect, mont=True):
    got = fr.unpack_ints(np.asarray(arr), mont=mont)
    assert got == expect


N = 64


def test_round_trip():
    vals = rand_vals(N) + [0, 1, C.R_MOD - 1]
    check(to_dev(vals), vals)


def test_add_sub_neg():
    a, b = rand_vals(N), rand_vals(N)
    da, db = to_dev(a), to_dev(b)
    check(fr.add(da, db), [oracle.add(x, y) for x, y in zip(a, b)])
    check(fr.sub(da, db), [oracle.sub(x, y) for x, y in zip(a, b)])
    check(fr.neg(da), [oracle.neg(x) for x in a])


def test_add_edge_cases():
    edge = [0, 1, C.R_MOD - 1, C.R_MOD - 2, (C.R_MOD - 1) // 2]
    a = edge * len(edge)
    b = [v for v in edge for _ in edge]
    check(fr.add(to_dev(a), to_dev(b)), [oracle.add(x, y) for x, y in zip(a, b)])
    check(fr.sub(to_dev(a), to_dev(b)), [oracle.sub(x, y) for x, y in zip(a, b)])


def test_mul_matches_oracle():
    a, b = rand_vals(N), rand_vals(N)
    check(fr.mul(to_dev(a), to_dev(b)), [oracle.mul(x, y) for x, y in zip(a, b)])


def test_mul_edge_cases():
    edge = [0, 1, 2, C.R_MOD - 1, C.R_MOD - 2]
    a = edge * len(edge)
    b = [v for v in edge for _ in edge]
    check(fr.mul(to_dev(a), to_dev(b)), [oracle.mul(x, y) for x, y in zip(a, b)])


def test_mont_mul_oracle_self_consistent():
    # oracle.mont_mul mirrors the limb algorithm exactly
    for _ in range(50):
        a, b = rng.randrange(C.R_MOD), rng.randrange(C.R_MOD)
        am, bm = oracle.to_mont(a), oracle.to_mont(b)
        assert oracle.from_mont(oracle.mont_mul(am, bm)) == oracle.mul(a, b)


def test_square_pow():
    a = rand_vals(N)
    da = to_dev(a)
    check(fr.square(da), [oracle.mul(x, x) for x in a])
    check(fr.pow_const(da, 11), [oracle.pow_(x, 11) for x in a])
    check(fr.pow_const(da, 0), [1] * N)
    check(fr.pow_const(da, 1), a)


def test_inv():
    a = [v if v else 1 for v in rand_vals(16)]
    check(fr.inv(to_dev(a)), [oracle.inv(x) for x in a])


def test_batch_inverse():
    a = [v if v else 1 for v in rand_vals(N)]
    check(fr.batch_inverse(to_dev(a), axis=1), [oracle.inv(x) for x in a])


def test_batch_inverse_2d():
    import jax.numpy as jnp

    a = [v if v else 1 for v in rand_vals(N)]
    da = to_dev(a).reshape(16, 4, N // 4)
    out = fr.batch_inverse(da, axis=2)
    check(out.reshape(16, N), [oracle.inv(x) for x in a])


def test_mul_const_and_constructors():
    a = rand_vals(N)
    check(fr.mul_const(to_dev(a), 12345), [oracle.mul(x, 12345) for x in a])
    check(fr.ones((3,)), [1, 1, 1])
    check(fr.zeros((3,)), [0, 0, 0])
    check(fr.full((2,), 7), [7, 7])


def test_predicates():
    a = [0, 1, 0, 5]
    da = to_dev(a)
    assert fr.is_zero(da).tolist() == [True, False, True, False]
    assert fr.eq(da, to_dev([0, 1, 1, 5])).tolist() == [True, True, False, True]


def test_codec_round_trip_and_mod_order():
    # values above r must reduce mod r like ark's from_be_bytes_mod_order
    raw = [rng.randrange(1 << 256) for _ in range(32)]
    data = np.stack(
        [np.frombuffer(v.to_bytes(32, "big"), dtype=np.uint8) for v in raw]
    )
    limbs = decode_be_bytes_mod_order(data)
    check(limbs, [v % C.R_MOD for v in raw])
    back = encode_be_bytes(np.asarray(limbs))
    for k, v in enumerate(raw):
        assert int.from_bytes(bytes(back[k].tobytes()), "big") == v % C.R_MOD


def test_two_adic_generator_order():
    g = C.TWO_ADIC_GENERATOR
    assert oracle.pow_(g, 1 << C.TWO_ADICITY) == 1
    assert oracle.pow_(g, 1 << (C.TWO_ADICITY - 1)) != 1
