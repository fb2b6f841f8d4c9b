"""Command-line driver.

Reproduces the reference driver's behavior (bin/src/main.rs:19-97) with real
flags instead of hard-coded paths/literals (SURVEY.md §5.6): load CBOR traces
(or generate synthetic ones), draw the α/δ challenges, build the trace on
device, prove, self-verify, and print the span-tree timing report.
"""

from __future__ import annotations

import argparse
import secrets
import sys
import time

from .challenger import HashChallenger
from .config import FriConfig, StarkConfig
from .field.constants import R_MOD
from .hash.poseidon2 import Poseidon2Params
from .prover import prove, verify
from .trace import (
    RawLookupTrace,
    RawPermutationTrace,
    build_trace,
    gen_lookup_trace,
    gen_permutation_trace,
)
from .utils import timing


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="linea-stark-tpu",
        description="TPU-native STARK prover for Linea trace constraints",
    )
    p.add_argument("--lookup", action="append", default=[], metavar="FILE",
                   help="CBOR lookup trace file (RawLookupTrace schema)")
    p.add_argument("--permutation", action="append", default=[], metavar="FILE",
                   help="CBOR permutation trace file (RawPermutationTrace schema)")
    p.add_argument("--synthetic-perm", metavar="WxH",
                   help="generate a random permutation trace, e.g. 3x524288")
    p.add_argument("--synthetic-lookup", metavar="WxHxT",
                   help="generate a random lookup trace, e.g. 2x65536x1")
    p.add_argument("--seed", type=int, default=None,
                   help="seed for challenges + synthetic traces (default: random)")
    p.add_argument("--log-blowup", type=int, default=3)
    p.add_argument("--final-poly-len", type=int, default=0)
    p.add_argument("--queries", type=int, default=33)
    p.add_argument("--pow-bits", type=int, default=0)
    p.add_argument("--hash-constants", metavar="JSON",
                   help="inject Poseidon2 round constants from a JSON file")
    p.add_argument("--proof-out", metavar="FILE", help="write the CBOR proof")
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--report", action="store_true", help="print span timing tree")
    p.add_argument("--hasher", choices=["poseidon2", "keccak"], default="poseidon2",
                   help="MMCS hasher (the reference's compile-time alias sweep)")
    p.add_argument("--transcript", choices=["native", "p3"], default="native",
                   help="transcript/proof-shape mode: native order or upstream "
                        "p3-uni-stark order (bit-reversed FRI, blowup-count "
                        "quotient chunks — PARITY.md §3)")
    p.add_argument("--quotient-chunks", type=int, default=None, metavar="C",
                   help="override the quotient chunk count (power of two "
                        "<= blowup; default: mode policy)")
    p.add_argument("--p3-proof-out", metavar="FILE",
                   help="also write the proof in the p3 serde/ciborium wire "
                        "layout (requires --transcript p3)")
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="row-shard the prove over an N-device mesh "
                        "(0 = single device; multi-host: see dist/launch.py)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    seed = args.seed if args.seed is not None else secrets.randbits(64)
    import random

    rng = random.Random(seed)
    # Challenges drawn before any commitment and passed as public values —
    # the reference's (documented, unsound) order, bin/src/main.rs:29-35;
    # SURVEY.md §5.9.1.
    alpha = rng.randrange(R_MOD)
    delta = rng.randrange(R_MOD)
    print(f"Challenge alpha: {alpha}")
    print(f"Challenge delta: {delta}")

    lookups = [RawLookupTrace.read_file(f) for f in args.lookup]
    perms = [RawPermutationTrace.read_file(f) for f in args.permutation]
    if args.synthetic_perm:
        w, h = (int(v) for v in args.synthetic_perm.split("x"))
        perms.append(gen_permutation_trace(w, h, seed=seed))
    if args.synthetic_lookup:
        w, h, t = (int(v) for v in args.synthetic_lookup.split("x"))
        lookups.append(gen_lookup_trace(w, h, num_b_tables=t, seed=seed))
    if not lookups and not perms:
        print("no traces given; use --lookup/--permutation/--synthetic-*",
              file=sys.stderr)
        return 2

    hash_params = (
        Poseidon2Params.from_json(args.hash_constants)
        if args.hash_constants
        else Poseidon2Params()
    )
    config = StarkConfig(
        fri=FriConfig(
            log_blowup=args.log_blowup,
            log_final_poly_len=args.final_poly_len,
            num_queries=args.queries,
            proof_of_work_bits=args.pow_bits,
        ),
        hash_params=hash_params,
        hasher=args.hasher,
        transcript=args.transcript,
        quotient_chunks=args.quotient_chunks,
    )

    timing.reset()
    print("Generating trace...")
    with timing.span("generate trace"):
        built = build_trace(perms, lookups, alpha, delta,
                            check=config.check_trace)
    print(f"Trace: width {built.air.width}, height {built.height}")

    print("Proving...")
    t0 = time.time()
    with timing.span("prove"):
        if args.mesh:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .dist.mesh import ROWS_AXIS, make_mesh
            from .dist.prove import prove_sharded

            mesh = make_mesh(args.mesh)
            trace = jax.device_put(
                built.matrix, NamedSharding(mesh, P(None, None, ROWS_AXIS))
            )
            proof = prove_sharded(config, built.air, trace, [alpha, delta],
                                  HashChallenger((), hash_params), mesh)
        else:
            proof = prove(config, built.air, built.matrix, [alpha, delta],
                          HashChallenger((), hash_params))
    print(f"Prove time: {time.time() - t0:.2f}s")

    if args.proof_out:
        data = proof.to_bytes()
        with open(args.proof_out, "wb") as f:
            f.write(data)
        print(f"Proof written: {args.proof_out} ({len(data)} bytes)")

    if args.p3_proof_out:
        from .prover.p3_codec import proof_to_p3_cbor

        data = proof_to_p3_cbor(proof)
        with open(args.p3_proof_out, "wb") as f:
            f.write(data)
        print(f"p3-layout proof written: {args.p3_proof_out} ({len(data)} bytes)")

    if not args.no_verify:
        print("Verification...")
        t0 = time.time()
        with timing.span("verify"):
            verify(config, built.air, proof, [alpha, delta],
                   HashChallenger((), hash_params))
        print(f"Verify time: {time.time() - t0:.2f}s — OK")

    if args.report:
        print(timing.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
