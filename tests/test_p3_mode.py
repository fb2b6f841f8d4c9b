"""p3 transcript mode: prove/verify round trip, bit-reversed FRI indexing,
blowup-count quotient chunks, and the p3 proof-schema codec (PARITY.md §3).
"""

import copy

import pytest

from linea_stark_tpu.challenger import HashChallenger
from linea_stark_tpu.config import FriConfig, StarkConfig
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.prover import VerificationError, prove, verify
from linea_stark_tpu.prover.p3_codec import proof_from_p3_cbor, proof_to_p3_cbor
from linea_stark_tpu.prover.proof import Proof
from linea_stark_tpu.trace import build_trace, gen_permutation_trace

ALPHA = 0x5DEECE66D % R_MOD
DELTA = 0xB1E32C5 % R_MOD

CFG = StarkConfig(
    fri=FriConfig(log_blowup=2, log_final_poly_len=0, num_queries=6,
                  proof_of_work_bits=1),
    transcript="p3",
)


def _built(width=3, height=16, seed=1):
    raw = gen_permutation_trace(width=width, height=height, seed=seed)
    return build_trace([raw], [], ALPHA, DELTA)


def _prove(built, cfg=CFG):
    return prove(cfg, built.air, built.matrix, [ALPHA, DELTA],
                 HashChallenger((), cfg.hash_params))


def _verify(built, proof, cfg=CFG):
    verify(cfg, built.air, proof, [ALPHA, DELTA],
           HashChallenger((), cfg.hash_params))


def test_p3_prove_verify_round_trip():
    built = _built(width=2, height=8, seed=1)
    proof = _prove(built)
    _verify(built, proof)
    # p3 structure: blowup-count chunks; every fold committed
    assert len(proof.quotient_chunks_at_zeta) == CFG.fri.blowup
    num_levels = proof.log_n  # (log_n + lb) - lb - log_final_poly_len
    assert len(proof.fri.commit_roots) == num_levels
    # single-index input openings with sibling-only commit steps
    qp = proof.fri.query_proofs[0]
    assert len(qp.input_openings) == 2
    assert len(qp.commit_steps) == num_levels


@pytest.mark.slow  # proves the same trace twice (both transcript modes)
def test_p3_differs_from_native_transcript():
    built = _built(seed=3)
    native = prove(
        StarkConfig(fri=CFG.fri), built.air, built.matrix, [ALPHA, DELTA],
        HashChallenger(),
    )
    p3 = _prove(built)
    # p3 commits bit-reversed rows (and blowup-count chunks): every
    # commitment differs from the native-mode proof over the same trace
    assert native.trace_root != p3.trace_root
    assert native.quotient_root != p3.quotient_root
    with pytest.raises(VerificationError):
        _verify(built, native)  # mode mismatch rejected


def test_p3_proof_cbor_round_trip():
    built = _built(width=2, height=8, seed=5)
    proof = _prove(built)
    blob = proof.to_bytes()
    _verify(built, Proof.from_bytes(blob))


def test_p3_codec_schema_round_trip():
    built = _built(width=2, height=8, seed=7)
    proof = _prove(built)
    wire = proof_to_p3_cbor(proof)
    back = proof_from_p3_cbor(wire, CFG.fri.log_blowup)
    assert back.log_n == proof.log_n and back.width == proof.width
    assert back.trace_root == proof.trace_root
    assert back.quotient_chunks_at_zeta == proof.quotient_chunks_at_zeta
    _verify(built, back)  # decoded proof verifies (indices re-derived)


def test_p3_tampering_rejected():
    built = _built(width=2, height=8, seed=9)
    proof = _prove(built)

    p = copy.deepcopy(proof)
    p.quotient_chunks_at_zeta[0] = (p.quotient_chunks_at_zeta[0] + 1) % R_MOD
    with pytest.raises(VerificationError):
        _verify(built, p)

    p = copy.deepcopy(proof)
    p.fri.query_proofs[0].commit_steps[0].sibling_value ^= 1
    with pytest.raises(VerificationError):
        _verify(built, p)

    p = copy.deepcopy(proof)
    p.fri.query_proofs[0].input_openings[0].rows[0][0] ^= 1
    with pytest.raises(VerificationError):
        _verify(built, p)

    p = copy.deepcopy(proof)
    p.fri.final_poly[0] = (p.fri.final_poly[0] + 1) % R_MOD
    with pytest.raises(VerificationError):
        _verify(built, p)

    p = copy.deepcopy(proof)
    p.fri.pow_witness = (p.fri.pow_witness + 1) % R_MOD
    with pytest.raises(VerificationError):
        _verify(built, p)


@pytest.mark.slow  # 2^9 rows: extra compile set beyond the tiny tier
def test_p3_medium_height_crosses_host_tail():
    """Enough height that committed fold levels span device->host tail and
    multiple bit-reversed levels."""
    raw = gen_permutation_trace(width=2, height=512, seed=11)
    built = build_trace([raw], [], ALPHA, DELTA, check=False)
    cfg = StarkConfig(
        fri=FriConfig(log_blowup=2, log_final_poly_len=1, num_queries=4,
                      proof_of_work_bits=0),
        transcript="p3",
    )
    proof = prove(cfg, built.air, built.matrix, [ALPHA, DELTA],
                  HashChallenger((), cfg.hash_params))
    assert len(proof.fri.final_poly) == 2
    verify(cfg, built.air, proof, [ALPHA, DELTA],
           HashChallenger((), cfg.hash_params))


def test_explicit_quotient_chunk_override():
    built = _built(width=2, height=8, seed=13)
    cfg = StarkConfig(
        fri=FriConfig(log_blowup=2, log_final_poly_len=0, num_queries=4,
                      proof_of_work_bits=0),
        quotient_chunks=4,
    )
    proof = prove(cfg, built.air, built.matrix, [ALPHA, DELTA],
                  HashChallenger((), cfg.hash_params))
    assert len(proof.quotient_chunks_at_zeta) == 4
    verify(cfg, built.air, proof, [ALPHA, DELTA],
           HashChallenger((), cfg.hash_params))
