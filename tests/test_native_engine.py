"""Differential tests: native C host engine vs the numpy-object oracle.

The native engine (native/fasthash.c) carries the verifier's Merkle sweeps
and the FRI tail; every entry point is checked against the pure-Python /
object-array implementations it replaces.
"""

import random

import numpy as np
import pytest

from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.hash import native_engine as ne
from linea_stark_tpu.hash import poseidon2 as p2
from linea_stark_tpu.ntt.ntt import root_of_unity

pytestmark = pytest.mark.skipif(
    not ne.available(), reason="no C compiler for the native engine"
)

rng = random.Random(0xFA57)


def _rand(n):
    return [rng.randrange(R_MOD) for _ in range(n)]


def test_field_batch_ops_match_oracle():
    a, b = _rand(64), _rand(64)
    au, bu = ne.ints_to_u64(a), ne.ints_to_u64(b)
    assert ne.u64_to_ints(ne.mul(au, bu)) == [x * y % R_MOD for x, y in zip(a, b)]
    assert ne.u64_to_ints(ne.add(au, bu)) == [(x + y) % R_MOD for x, y in zip(a, b)]
    assert ne.u64_to_ints(ne.sub(au, bu)) == [(x - y) % R_MOD for x, y in zip(a, b)]
    assert ne.u64_to_ints(ne.inv(au)) == [pow(x, R_MOD - 2, R_MOD) for x in a]
    assert ne.u64_to_ints(ne.powers(a[0], 7)) == [
        pow(a[0], i, R_MOD) for i in range(7)
    ]


def test_mont_round_trip():
    a = _rand(32)
    au = ne.ints_to_u64(a)
    assert ne.u64_to_ints(ne.from_mont(ne.to_mont(au))) == a


def test_planes_round_trip():
    from linea_stark_tpu.field import fr

    a = _rand(16)
    planes = np.asarray(fr.pack_ints(a))  # Montgomery limb planes
    u = ne.from_mont(ne.planes_to_u64(planes))
    assert ne.u64_to_ints(u) == a
    back = ne.u64_to_planes(ne.to_mont(u))
    assert fr.unpack_ints(back) == a


def test_permute_matches_scalar_oracle():
    s = _rand(3)
    got = ne.permute(*(ne.ints_to_u64([x]) for x in s), p2.DEFAULT_PARAMS)
    assert [ne.u64_to_ints(g)[0] for g in got] == p2.permute_ints(s)


def test_hash_columns_and_compress_match_oracle():
    for w in (1, 2, 3, 5, 8):
        cols = [_rand(6) for _ in range(w)]
        cu = np.stack([ne.ints_to_u64(c) for c in cols])
        got = ne.u64_to_ints(ne.hash_columns(cu, p2.DEFAULT_PARAMS))
        assert got == [
            p2.hash_ints([cols[c][i] for c in range(w)]) for i in range(6)
        ]
    a, b = _rand(9), _rand(9)
    got = ne.u64_to_ints(
        ne.compress(ne.ints_to_u64(a), ne.ints_to_u64(b), p2.DEFAULT_PARAMS)
    )
    assert got == [p2.compress_ints(x, y) for x, y in zip(a, b)]


def test_tree_levels_match_scalar():
    leaves = _rand(16)
    lv = ne.tree_levels(ne.ints_to_u64(leaves), p2.DEFAULT_PARAMS)
    cur = list(leaves)
    for g in lv:
        cur = [
            p2.compress_ints(cur[2 * i], cur[2 * i + 1])
            for i in range(len(cur) // 2)
        ]
        assert ne.u64_to_ints(g) == cur
    assert len(cur) == 1


def test_fold_matches_object_path():
    import os

    from linea_stark_tpu.hash import np_poseidon2 as npp

    f = _rand(64)
    om, sh, beta = root_of_unity(6), 11, rng.randrange(R_MOD)
    got = ne.u64_to_ints(ne.fold(ne.ints_to_u64(f), beta, sh, om))
    os.environ["LINEA_NO_NATIVE"] = "1"
    try:
        want = list(npp.fold_vec(np.array(f, dtype=object), beta, sh, om))
    finally:
        del os.environ["LINEA_NO_NATIVE"]
    assert got == want


def test_merkle_roots_walk():
    # one lane per index of a height-8 tree built with the scalar oracle
    leaves = _rand(8)
    levels = [list(leaves)]
    while len(levels[-1]) > 1:
        cur = levels[-1]
        levels.append(
            [
                p2.compress_ints(cur[2 * i], cur[2 * i + 1])
                for i in range(len(cur) // 2)
            ]
        )
    root = levels[-1][0]
    q = 8
    dig = ne.ints_to_u64(leaves)
    sibs = np.zeros((q, 3, 4), np.uint64)
    mask = np.zeros((q, 4), np.uint64)
    lens = np.full(q, 3, np.uint32)
    for idx in range(q):
        cur = idx
        path = []
        for l in range(3):
            path.append(levels[l][cur ^ 1])
            if cur & 1:
                mask[idx, 0] |= np.uint64(1) << np.uint64(l)
            cur >>= 1
        sibs[idx] = ne.ints_to_u64(path)
    got = ne.u64_to_ints(ne.merkle_roots(dig, sibs, mask, lens, p2.DEFAULT_PARAMS))
    assert got == [root] * q
