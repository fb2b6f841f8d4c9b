"""Merkle MMCS: commit/open/verify, batch + multi-height injection."""

import random

import jax.numpy as jnp
import numpy as np

from linea_stark_tpu.field import fr
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.hash import poseidon2 as p2
from linea_stark_tpu.merkle import commit, open_at, verify_opening

rng = random.Random(5)


def rand_matrix(width, height):
    vals = [rng.randrange(R_MOD) for _ in range(width * height)]
    return jnp.asarray(fr.pack_ints(vals)).reshape(16, width, height), vals


def test_single_matrix_commit_open_verify():
    w, h = 3, 16
    m, _ = rand_matrix(w, h)
    tree = commit([m])
    openings = open_at(tree, [0, 5, 15])
    for op in openings:
        assert verify_opening(tree.root_int(), [(h, w)], op)
    # tamper
    bad = openings[0]
    bad.rows[0][1] = (bad.rows[0][1] + 1) % R_MOD
    assert not verify_opening(tree.root_int(), [(h, w)], bad)


def test_root_matches_host_recompute():
    w, h = 2, 8
    m, vals = rand_matrix(w, h)
    cols = [vals[:h], vals[h:]]
    digests = [p2.hash_ints([cols[0][i], cols[1][i]]) for i in range(h)]
    while len(digests) > 1:
        digests = [
            p2.compress_ints(digests[2 * i], digests[2 * i + 1])
            for i in range(len(digests) // 2)
        ]
    tree = commit([m])
    assert tree.root_int() == digests[0]


def test_batch_equal_height():
    h = 8
    m1, _ = rand_matrix(2, h)
    m2, _ = rand_matrix(3, h)
    tree = commit([m1, m2])
    for op in open_at(tree, [3, 7]):
        assert verify_opening(tree.root_int(), [(h, 2), (h, 3)], op)


def test_batch_multi_height_injection():
    m1, _ = rand_matrix(2, 16)
    m2, _ = rand_matrix(3, 4)
    tree = commit([m1, m2])
    for op in open_at(tree, [0, 9, 15]):
        assert verify_opening(tree.root_int(), [(16, 2), (4, 3)], op)
    bad = open_at(tree, [4])[0]
    bad.rows[1][0] = (bad.rows[1][0] + 1) % R_MOD
    assert not verify_opening(tree.root_int(), [(16, 2), (4, 3)], bad)


def test_wrong_index_fails():
    m, _ = rand_matrix(2, 8)
    tree = commit([m])
    op = open_at(tree, [3])[0]
    op.index = 4
    assert not verify_opening(tree.root_int(), [(8, 2)], op)
