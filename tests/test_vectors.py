"""Golden-vector harness: verify captured reference proofs.

Auto-activates when capture directories appear under ``tests/vectors/``
(produced with tools/capture_reference/ — see its README).  Each directory
holds one reference run's artifacts:

    constants.json   Poseidon2 round constants (Poseidon2Params.from_json)
    challenges.json  {"alpha": int-ish, "delta": int-ish}
    proof.bin        ciborium bytes of the p3 Proof
    trace.bin        the CBOR trace file the run proved
    meta.json        {"log_blowup", "num_queries", "pow_bits", "workload"}

Passing here demonstrates the BASELINE.md correctness bar: the reference
prover's output verifies under this framework's verifier over the same
field / transcript / challenger (PARITY.md §3.4).  With no vectors present
every case skips — the code path itself is covered by tests/test_p3_mode.py
round-trips.
"""

import glob
import json
import os

import pytest

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")
VECTORS = sorted(
    d for d in glob.glob(os.path.join(VEC_DIR, "*")) if os.path.isdir(d)
)


def _load_json(d, name):
    with open(os.path.join(d, name)) as f:
        return json.load(f)


@pytest.mark.skipif(not VECTORS, reason="no captured reference vectors")
@pytest.mark.parametrize("vec", VECTORS, ids=[os.path.basename(v) for v in VECTORS])
def test_reference_proof_verifies(vec):
    from linea_stark_tpu.challenger import HashChallenger
    from linea_stark_tpu.config import FriConfig, StarkConfig
    from linea_stark_tpu.hash.poseidon2 import Poseidon2Params
    from linea_stark_tpu.prover import verify
    from linea_stark_tpu.prover.p3_codec import proof_from_p3_cbor
    from linea_stark_tpu.trace import build_trace
    from linea_stark_tpu.trace.loader import RawLookupTrace, RawPermutationTrace

    meta = _load_json(vec, "meta.json")
    ch = _load_json(vec, "challenges.json")
    alpha, delta = int(ch["alpha"]), int(ch["delta"])
    params = Poseidon2Params.from_json(os.path.join(vec, "constants.json"))

    trace_path = os.path.join(vec, "trace.bin")
    if meta.get("workload", "lookup") == "permutation":
        raw = RawPermutationTrace.read_file(trace_path)
        built = build_trace([raw], [], alpha, delta)
    else:
        raw = RawLookupTrace.read_file(trace_path)
        built = build_trace([], [raw], alpha, delta)

    cfg = StarkConfig(
        fri=FriConfig(
            log_blowup=int(meta.get("log_blowup", 3)),
            log_final_poly_len=int(meta.get("log_final_poly_len", 0)),
            num_queries=int(meta.get("num_queries", 33)),
            proof_of_work_bits=int(meta.get("pow_bits", 0)),
        ),
        hash_params=params,
        transcript="p3",
    )

    with open(os.path.join(vec, "proof.bin"), "rb") as f:
        raw_proof = f.read()

    # The fork's serde field-element byte order is unverifiable without its
    # source (prover/p3_codec.py docstring): try LE first, then BE.
    errors = []
    for endian in ("little", "big"):
        try:
            proof = proof_from_p3_cbor(
                raw_proof, cfg.fri.log_blowup, endian=endian
            )
            verify(cfg, built.air, proof, [alpha, delta],
                   HashChallenger(params=params))
            return  # verified
        except Exception as e:  # decode OR verify failure: try other endian
            errors.append(f"{endian}: {e!r}")
    pytest.fail("reference proof did not verify; " + " | ".join(errors))
