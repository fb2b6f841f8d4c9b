#!/usr/bin/env python
"""Headline benchmark: prove the 3x3 x 2^19-row permutation AIR.

This is the reference's README workload (README.md:11: ~330 s on a 24-core
x86; BASELINE.md).  Prints exactly one JSON line on stdout:

    {"metric": ..., "value": <prove seconds>, "unit": "s", "vs_baseline": <speedup>}

Sub-metrics (kernel throughputs, span tree) go to stderr.
Env knobs: BENCH_LOG_HEIGHT (default 19), BENCH_WIDTH (default 3),
BENCH_QUERIES / BENCH_POW_BITS to mirror other FRI configs.
"""

import json
import os
import sys
import time

import jax

# The persistent compilation cache is deliberately NOT enabled here: under
# the remote-TPU (axon) backend, executables deserialized from the cache can
# hang forever at execution time (observed with the Pallas scan kernels —
# a fresh compile of the same program runs fine).  Every bench run therefore
# pays fresh compiles; the prover is engineered to keep that cost small
# (few distinct kernel shapes, loop-rolled kernel bodies).
if os.environ.get("BENCH_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir", os.environ["BENCH_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_PROVE_S = 330.0  # README.md:11 (same workload, 24-core CPU)


def main() -> int:
    log_h = int(os.environ.get("BENCH_LOG_HEIGHT", "19"))
    width = int(os.environ.get("BENCH_WIDTH", "3"))
    queries = int(os.environ.get("BENCH_QUERIES", "33"))
    pow_bits = int(os.environ.get("BENCH_POW_BITS", "0"))
    height = 1 << log_h

    from linea_stark_tpu.challenger import HashChallenger
    from linea_stark_tpu.config import FriConfig, StarkConfig
    from linea_stark_tpu.field.constants import R_MOD
    from linea_stark_tpu.prover import prove, verify
    from linea_stark_tpu.trace import build_trace, gen_permutation_trace
    from linea_stark_tpu.utils import timing

    import random

    rng = random.Random(0xBE7C4)
    alpha, delta = rng.randrange(R_MOD), rng.randrange(R_MOD)

    config = StarkConfig(
        fri=FriConfig(log_blowup=3, log_final_poly_len=0, num_queries=queries,
                      proof_of_work_bits=pow_bits),
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"workload: {width}x{width} x 2^{log_h} permutation AIR", file=sys.stderr)

    t0 = time.time()
    raw = gen_permutation_trace(width, height, seed=7)
    built = build_trace([raw], [], alpha, delta, check=False)
    built.matrix.block_until_ready()
    print(f"trace build: {time.time() - t0:.2f}s", file=sys.stderr)

    # Warm-up pass at the same height: first execution pays one-time remote
    # kernel compiles / cache loads; the headline number is the steady state.
    warm = os.environ.get("BENCH_WARMUP", "1") == "1"
    if warm:
        t0 = time.time()
        prove(config, built.air, built.matrix, [alpha, delta], HashChallenger())
        print(f"warmup prove: {time.time() - t0:.2f}s", file=sys.stderr)

    timing.reset()
    t0 = time.time()
    proof = prove(config, built.air, built.matrix, [alpha, delta], HashChallenger())
    prove_s = time.time() - t0
    print(timing.report(), file=sys.stderr)

    t0 = time.time()
    verify(config, built.air, proof, [alpha, delta], HashChallenger())
    print(f"verify: {time.time() - t0:.2f}s (ok)", file=sys.stderr)

    if pow_bits > 0:
        grind_s = timing.span_seconds("grind PoW")
        if grind_s:
            # The device grind evaluates whole candidate batches, so the work
            # actually performed is the witness's batch count rounded up.
            from linea_stark_tpu.fri.grind import DEFAULT_BATCH

            batches = proof.fri.pow_witness // DEFAULT_BATCH + 1
            perms = batches * DEFAULT_BATCH
            print(
                f"PoW grind: {pow_bits} bits, witness {proof.fri.pow_witness}, "
                f"{perms / grind_s / 1e6:.2f}M perms/s device throughput "
                f"(reference CPU 0.22M perms/s)",
                file=sys.stderr,
            )

    print(json.dumps({
        "metric": f"prove_permutation_{width}x{width}_2^{log_h}",
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_PROVE_S / prove_s, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
