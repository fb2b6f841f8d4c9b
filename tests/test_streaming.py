"""Streamed (coefficient-resident) trace commitment — pcs/streaming.py.

The streamed path exists so heights whose LDE exceeds HBM still prove on
one chip (BENCH_MATRIX row 6).  Correctness bar: the streamed prover must
produce a BIT-IDENTICAL proof to the materialized path (same LDE values →
same digests → same transcript), at tiny shapes on CPU.
"""

import random

import pytest

from linea_stark_tpu.challenger import HashChallenger
from linea_stark_tpu.config import FriConfig, StarkConfig
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.pcs import streaming
from linea_stark_tpu.prover import prove, verify

from linea_stark_tpu.trace import build_trace, gen_permutation_trace

rng = random.Random(77)


def _built(n=256, w=3):
    alpha, delta = rng.randrange(R_MOD), rng.randrange(R_MOD)
    raw = gen_permutation_trace(w, n, seed=21)
    return build_trace([raw], [], alpha, delta, check=False), alpha, delta


@pytest.mark.parametrize("transcript", ["native", "p3"])
def test_streamed_proof_bit_identical(monkeypatch, transcript):
    built, alpha, delta = _built()
    cfg = StarkConfig(
        fri=FriConfig(log_blowup=2, log_final_poly_len=0, num_queries=4,
                      proof_of_work_bits=0),
        transcript=transcript,
    )
    baseline = prove(cfg, built.air, built.matrix, [alpha, delta],
                     HashChallenger())

    monkeypatch.setattr(streaming, "STREAM_LDE_BYTES", 1)
    streamed = prove(cfg, built.air, built.matrix, [alpha, delta],
                     HashChallenger())
    assert streamed.to_bytes() == baseline.to_bytes()
    verify(cfg, built.air, streamed, [alpha, delta], HashChallenger())


def test_streamed_group_boundaries(monkeypatch):
    """Width not divisible by the group size exercises the odd-tail absorb
    and multi-group accumulation paths."""
    built, alpha, delta = _built(n=128, w=5)  # trace width 2*5+2 = 12
    cfg = StarkConfig(
        fri=FriConfig(log_blowup=2, log_final_poly_len=0, num_queries=3,
                      proof_of_work_bits=0)
    )
    baseline = prove(cfg, built.air, built.matrix, [alpha, delta],
                     HashChallenger())
    monkeypatch.setattr(streaming, "STREAM_LDE_BYTES", 1)
    # force several small groups incl. an odd-width last one
    orig = streaming.make_lazy_lde

    def tiny_groups(trace, log_blowup, shift):
        lazy = orig(trace, log_blowup, shift)
        lazy.group = 4  # 12 cols -> groups of 4, 4, 4
        return lazy

    monkeypatch.setattr(streaming, "make_lazy_lde", tiny_groups)
    streamed = prove(cfg, built.air, built.matrix, [alpha, delta],
                     HashChallenger())
    assert streamed.to_bytes() == baseline.to_bytes()
