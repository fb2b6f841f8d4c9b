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


def test_per_chunk_lde_matches_batched():
    """The streamed-height per-chunk LDE programs (chunk_lde_single) must
    produce exactly the batched transform's values (pcs/two_adic_fri.py
    _chunk_ldes_batched's size-gated split)."""
    import jax.numpy as jnp
    import numpy as np

    from linea_stark_tpu.field import fr
    from linea_stark_tpu.field.constants import COSET_SHIFT, R_MOD
    from linea_stark_tpu.ntt.ntt import root_of_unity
    from linea_stark_tpu.pcs.two_adic_fri import (
        _chunk_lde_single_jit,
        _chunk_ldes_impl,
    )

    n, b, log_blowup = 64, 2, 2
    omega_lde = root_of_unity((n.bit_length() - 1) + log_blowup)
    vals = [rng.randrange(R_MOD) for _ in range(b * n)]
    chunks = jnp.asarray(fr.pack_ints(vals)).reshape(16, b, n)
    want = np.asarray(
        _chunk_ldes_impl(chunks, log_blowup, COSET_SHIFT, omega_lde)
    )
    for i in range(b):
        got = np.asarray(
            _chunk_lde_single_jit(
                chunks[:, i : i + 1], log_blowup, COSET_SHIFT,
                (COSET_SHIFT * pow(omega_lde, i, R_MOD)) % R_MOD,
            )
        )
        assert (got[:, 0] == want[:, i]).all(), f"chunk {i}"


def test_streamed_quotient_bit_identical(monkeypatch):
    """Streaming BOTH the trace and the quotient chunk stack (the 2^22
    config's memory shape) must still produce a bit-identical proof."""
    built, alpha, delta = _built(n=256, w=3)
    cfg = StarkConfig(
        fri=FriConfig(log_blowup=2, log_final_poly_len=0, num_queries=4,
                      proof_of_work_bits=0)
    )
    baseline = prove(cfg, built.air, built.matrix, [alpha, delta],
                     HashChallenger())
    monkeypatch.setattr(streaming, "STREAM_LDE_BYTES", 1)
    monkeypatch.setattr(streaming, "STREAM_CHUNK_BYTES", 1)
    streamed = prove(cfg, built.air, built.matrix, [alpha, delta],
                     HashChallenger())
    assert streamed.to_bytes() == baseline.to_bytes()
    verify(cfg, built.air, streamed, [alpha, delta], HashChallenger())
