"""serde/ciborium-layout codec for the upstream p3-uni-stark ``Proof`` struct.

Mirrors the wire shape a ``ciborium::into_writer(&proof)`` of the fork's
proof type would produce (PARITY.md §3 item 3), so a captured reference
proof can be decoded once its Poseidon2 constants are captured too:

    Proof {
        commitments: Commitments { trace, quotient_chunks },        # maps
        opened_values: OpenedValues {
            trace_local: Vec<Challenge>,
            trace_next: Vec<Challenge>,
            quotient_chunks: Vec<Vec<Challenge>>,                   # 1 col per chunk
        },
        opening_proof: TwoAdicFriPcsProof {
            fri_proof: FriProof {
                commit_phase_commits: Vec<Com>,
                query_proofs: Vec<QueryProof {
                    commit_phase_openings: Vec<CommitPhaseProofStep {
                        sibling_value, opening_proof: Vec<[Val; 1]> }> }>,
                final_poly: Vec<Challenge>,
                pow_witness: Val,
            },
            query_openings: Vec<Vec<BatchOpening {
                opened_values: Vec<Vec<Val>>,
                opening_proof: Vec<[Val; 1]> }>>,                   # per query, per round
        },
        degree_bits: usize,
    }

serde struct -> CBOR map keyed by field-name strings; Vec -> CBOR array;
[T; 1] digests -> 1-element arrays.  Field elements use 32-byte
little-endian bytestrings (arkworks' CanonicalSerialize order — the one
encoding the fork could emit that is checkable without its source); pass
``fe="int"`` for self-describing integer leaves instead.

Known open item (PARITY.md §2): the byte-level field-element encoding and
the fork's exact serde derive cannot be confirmed without the fork source —
the structural layout here is code-complete and the leaf codec is swappable.
"""

from __future__ import annotations

from ..field.constants import R_MOD
from ..merkle.mmcs import BatchOpening
from ..utils import cbor
from .proof import CommitPhaseStep, FriProof, P3QueryProof, Proof


def _enc_fe_bytes(v: int) -> bytes:
    return int(v).to_bytes(32, "little")


def _dec_fe_bytes(b, endian: str = "little") -> int:
    if isinstance(b, (bytes, bytearray)):
        v = int.from_bytes(bytes(b), endian)
    else:
        v = int(b)
    assert v < R_MOD, "non-canonical field element"
    return v


def _codec(fe: str, endian: str = "little"):
    import functools

    dec = functools.partial(_dec_fe_bytes, endian=endian)
    if fe == "int":
        return int, dec
    return _enc_fe_bytes, dec


def proof_to_p3_cbor(proof: Proof, fe: str = "bytes") -> bytes:
    """Encode a p3-transcript proof in the p3 ``Proof`` wire layout."""
    assert proof.transcript == "p3", "p3 codec requires a p3-mode proof"
    enc, _ = _codec(fe)

    def com(root: int):
        return [enc(root)]  # Hash<Val, Val, 1> == [Val; 1]

    def path(siblings):
        return [[enc(s)] for s in siblings]

    def batch_opening(o: BatchOpening):
        return {
            "opened_values": [[enc(v) for v in row] for row in o.rows],
            "opening_proof": path(o.siblings),
        }

    d = {
        "commitments": {
            "trace": com(proof.trace_root),
            "quotient_chunks": com(proof.quotient_root),
        },
        "opened_values": {
            "trace_local": [enc(v) for v in proof.trace_at_zeta],
            "trace_next": [enc(v) for v in proof.trace_at_zeta_next],
            # one width-1 matrix per chunk in p3's commitment batch
            "quotient_chunks": [[enc(v)] for v in proof.quotient_chunks_at_zeta],
        },
        "opening_proof": {
            "fri_proof": {
                "commit_phase_commits": [com(r) for r in proof.fri.commit_roots],
                "query_proofs": [
                    {
                        "commit_phase_openings": [
                            {
                                "sibling_value": enc(s.sibling_value),
                                "opening_proof": path(s.path),
                            }
                            for s in q.commit_steps
                        ]
                    }
                    for q in proof.fri.query_proofs
                ],
                "final_poly": [enc(c) for c in proof.fri.final_poly],
                "pow_witness": enc(proof.fri.pow_witness),
            },
            "query_openings": [
                [batch_opening(o) for o in q.input_openings]
                for q in proof.fri.query_proofs
            ],
        },
        "degree_bits": proof.log_n,
    }
    return cbor.dumps(d)


def proof_from_p3_cbor(data: bytes, log_blowup: int,
                       endian: str = "little") -> Proof:
    """Decode a p3-layout proof back into the framework's container.

    ``log_blowup`` reconstructs the query indices' home heights; the trace
    width is inferred from ``opened_values.trace_local``.  ``endian``
    selects the 32-byte field-element leaf decode ("little" = arkworks
    CanonicalSerialize; "big" offered because the fork's serde derive is
    unverifiable without its source — tests/test_vectors.py tries both)."""
    d = cbor.loads(data)
    _, dec = _codec("bytes", endian)

    def com(c):
        return dec(c[0])

    def path(p):
        return [dec(s[0]) for s in p]

    def batch_opening(e, index: int):
        return BatchOpening(
            index=index,
            rows=[[dec(v) for v in row] for row in e["opened_values"]],
            siblings=path(e["opening_proof"]),
        )

    ov = d["opened_values"]
    op = d["opening_proof"]
    fri = op["fri_proof"]
    log_n = d["degree_bits"]
    commit_roots = [com(c) for c in fri["commit_phase_commits"]]

    query_proofs = []
    for q_fri, q_inputs in zip(fri["query_proofs"], op["query_openings"]):
        steps = [
            CommitPhaseStep(
                sibling_value=dec(s["sibling_value"]),
                path=path(s["opening_proof"]),
            )
            for s in q_fri["commit_phase_openings"]
        ]
        # Input indices are not serialized in p3 (the verifier re-derives
        # them from the challenger); use -1 and let verify() recompute.
        query_proofs.append(
            P3QueryProof(
                input_openings=[batch_opening(e, -1) for e in q_inputs],
                commit_steps=steps,
            )
        )

    chunks_at_zeta = [dec(row[0]) for row in ov["quotient_chunks"]]
    return Proof(
        log_n=log_n,
        width=len(ov["trace_local"]),
        trace_root=com(d["commitments"]["trace"]),
        quotient_root=com(d["commitments"]["quotient_chunks"]),
        trace_at_zeta=[dec(v) for v in ov["trace_local"]],
        trace_at_zeta_next=[dec(v) for v in ov["trace_next"]],
        quotient_chunks_at_zeta=chunks_at_zeta,
        fri=FriProof(
            commit_roots=commit_roots,
            final_poly=[dec(c) for c in fri["final_poly"]],
            pow_witness=dec(fri["pow_witness"]),
            query_proofs=query_proofs,
        ),
        transcript="p3",
    )
