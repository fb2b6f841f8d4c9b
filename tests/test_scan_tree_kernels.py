"""Whole-subtree Merkle kernel + fused batch-inverse finish (interpret mode).

These kernels collapse dispatch-latency-bound phases (batch-inverse
finish, FRI-level tree builds) into one launch each; correctness is checked
against the plain-XLA implementations and Python oracles.  (The
sequential-grid scan kernel that used to live here was deleted in round 4 —
see fr_ops.py.)
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

# Interpret-mode execution of the unrolled Pallas kernel bodies is minutes
# per test on CPU; the TPU bench exercises the compiled kernels for real.
pytestmark = pytest.mark.slow

from linea_stark_tpu import fr_ops as fo
from linea_stark_tpu.field import fr
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.hash import poseidon2 as p2
from linea_stark_tpu.kernels import pallas_field as pf
from linea_stark_tpu.kernels import pallas_poseidon2 as pk
from linea_stark_tpu.merkle import mmcs

rng = random.Random(11)


def rand_vals(n):
    return [rng.randrange(1, R_MOD) for _ in range(n)]


def test_mul3_scalar():
    n = 256
    a_v, b_v = rand_vals(n), rand_vals(n)
    c_v = rng.randrange(1, R_MOD)
    a = jnp.asarray(fr.pack_ints(a_v))
    b = jnp.asarray(fr.pack_ints(b_v))
    c = jnp.asarray(fr.pack_ints([c_v]))[:, 0]
    got = fr.unpack_ints(np.asarray(pf.mul3_scalar(a, b, c)))
    for i in range(n):
        assert got[i] == a_v[i] * b_v[i] % R_MOD * c_v % R_MOD


# Reduced-round parameter set: the subtree/tree-step tests check pairing,
# bit-reversal, and host-finish STRUCTURE (the full 46-round permutation is
# covered by test_poseidon2.py); interpret-mode execution of full rounds is
# minutes per level on CPU.
TINY_PARAMS = p2.Poseidon2Params(
    rounds_f=2, rounds_p=1,
    constants=tuple(p2.derive_round_constants(rounds_f=2, rounds_p=1)),
)


def test_full_round_permute2_and_tree_step():
    """Full 46-round kernel bodies (not TINY_PARAMS) through permute2 and one
    2-D tree_step, on a handful of lanes vs the scalar oracle — the
    concatenated-S-box _rounds path at production round counts (round-3
    advisor: only the slow grind test covered full rounds, and only via
    permute)."""
    params = p2.DEFAULT_PARAMS
    n = 4
    a_v, b_v = rand_vals(n), rand_vals(n)
    a = jnp.asarray(fr.pack_ints(a_v))
    b = jnp.asarray(fr.pack_ints(b_v))
    o0, o1, o2 = pk.permute2(a, b, params)
    for i in range(n):
        want = p2.permute_ints([a_v[i], b_v[i], 0], params)
        got = [
            fr.unpack_ints(np.asarray(o[..., i : i + 1]))[0] for o in (o0, o1, o2)
        ]
        assert got == want, f"permute2 lane {i}"

    # one tree_step over a 2-row buffer (2 x 128 lanes, pairing distance 1
    # row): out[j] = compress(X[j], X[j + 1 row]) for the first row
    lanes = pk._TREE_LANES
    vals = rand_vals(2 * lanes)
    buf = jnp.asarray(fr.pack_ints(vals)).reshape(16, 2, lanes)
    out = pk._tree_step(buf, jnp.asarray([1], dtype=jnp.int32), params)
    got = fr.unpack_ints(np.asarray(out.reshape(16, lanes)))
    for j in range(lanes):
        assert got[j] == p2.compress_ints(vals[j], vals[lanes + j], params)


def test_subtree_levels_matches_sweeps():
    n = 1024  # kernel path covers 512/256/128, host finish covers 64..1
    vals = rand_vals(n)
    d = jnp.asarray(fr.pack_ints(vals))
    br = mmcs._bitrev_table(n)
    ups = pk.subtree_levels(jnp.take(d, jnp.asarray(br), axis=-1), TINY_PARAMS)
    # natural-order reference: repeated adjacent-pair compress_ints
    level = list(vals)
    for l, u in enumerate(ups):
        level = [
            p2.compress_ints(level[2 * i], level[2 * i + 1], TINY_PARAMS)
            for i in range(len(level) // 2)
        ]
        w = u.shape[-1]
        got = fr.unpack_ints(np.asarray(u))
        brl = mmcs._bitrev_table(w)
        nat = [got[brl[s]] for s in range(w)]
        assert nat == level, f"level {l + 1} mismatch"


def test_mmcs_pallas_br_path_matches_xla(monkeypatch):
    """Force the Pallas commit path (interpret mode) with a tiny subtree
    kernel threshold; root and openings must match the XLA path."""
    from linea_stark_tpu.hash.hasher import Poseidon2Hasher

    h = 512
    w = 2
    hasher = Poseidon2Hasher(TINY_PARAMS)
    vals = rand_vals(w * h)
    m = jnp.asarray(fr.pack_ints(vals)).reshape(16, w, h)

    tree_xla = mmcs.commit([m], hasher)
    root = tree_xla.root_int()

    monkeypatch.setenv("LINEA_TPU_BACKEND", "pallas")
    monkeypatch.setattr(mmcs, "TREE_SWEEP_SIZE", 256)
    monkeypatch.setattr(mmcs, "HOST_TREE_THRESHOLD", 16)
    tree_p = mmcs.commit([m], hasher)
    assert tree_p.br_start is not None
    assert tree_p.root_int() == root

    idxs = [0, 1, 63, 64, 101, h - 1]
    ops_p = mmcs.open_at(tree_p, idxs)
    ops_x = mmcs.open_at(tree_xla, idxs)
    for op, ox in zip(ops_p, ops_x):
        assert op.rows == ox.rows
        assert op.siblings == ox.siblings
        assert mmcs.verify_opening(root, [(h, w)], op, hasher)


def test_grind_device_path_matches_host(monkeypatch):
    """The vectorized grind finds a witness the host challenger accepts and
    advances the transcript identically to the host grind."""
    from linea_stark_tpu.challenger import HashChallenger
    from linea_stark_tpu.fri.grind import grind

    bits = 13  # > the host-fallback threshold of 8 (grind.py)

    ch_host = HashChallenger()
    ch_host.observe(12345)
    ch_host.observe(67890)
    w_host = ch_host.grind(bits)

    ch_dev = HashChallenger()
    ch_dev.observe(12345)
    ch_dev.observe(67890)
    monkeypatch.setenv("LINEA_TPU_BACKEND", "pallas")
    w_dev = grind(ch_dev, bits, batch=4096)

    assert w_dev == w_host  # both take the smallest witness
    assert ch_dev.input_buffer == ch_host.input_buffer
    # next samples agree -> transcripts identical
    assert ch_dev.sample() == ch_host.sample()
