"""Challenger semantics: determinism, chaining, proof-of-work."""

from linea_stark_tpu.challenger import HashChallenger
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.hash import poseidon2 as p2


def test_deterministic_replay():
    c1, c2 = HashChallenger(), HashChallenger()
    for c in (c1, c2):
        c.observe(123)
        c.observe(456)
    assert c1.sample() == c2.sample()
    assert c1.sample() == c2.sample()


def test_observe_clears_output():
    c1, c2 = HashChallenger(), HashChallenger()
    c1.observe(1)
    _ = c1.sample()
    c1.observe(2)
    c2.observe(1)
    c2.sample()
    c2.observe(2)
    assert c1.sample() == c2.sample()
    # but sampling before/after observe differs from never sampling
    c3 = HashChallenger()
    c3.observe(1)
    c3.observe(2)
    assert c3.input_buffer == [1, 2]


def test_first_sample_matches_sponge():
    c = HashChallenger()
    c.observe(7)
    c.observe(8)
    assert c.sample() == p2.hash_ints([7, 8])


def test_sample_chains_state():
    c = HashChallenger()
    c.observe(7)
    s1 = c.sample()
    s2 = c.sample()
    # second sample flushes input [s1]
    assert s2 == p2.hash_ints([s1])
    assert s1 != s2


def test_sample_bits_range():
    c = HashChallenger()
    c.observe(42)
    for bits in (1, 8, 20):
        v = c.clone().sample_bits(bits)
        assert 0 <= v < (1 << bits)


def test_grind_and_check():
    c = HashChallenger()
    c.observe(99)
    verifier = c.clone()
    w = c.grind(4)
    assert verifier.check_witness(4, w)
    # prover and verifier transcripts stay in sync after the grind
    assert c.sample() == verifier.sample()
