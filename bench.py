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

# Persistent compilation cache: ON by default.  Through round 3 this was
# disabled because cached executables wedged the remote axon runtime at
# execution time; round 4 deleted the offending sequential-grid scan kernel
# and re-verified that back-to-back cached runs complete (BENCH_MATRIX.md).
# Opt out with BENCH_NO_JAX_CACHE=1; point elsewhere with BENCH_JAX_CACHE=.
if not os.environ.get("BENCH_NO_JAX_CACHE"):
    _cache = os.environ.get("BENCH_JAX_CACHE") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"
    )
    jax.config.update("jax_compilation_cache_dir", _cache)
    # min-compile-time 0: the cold-start bill is dozens of small programs
    # whose compiles are individually <0.5s but collectively minutes over
    # the remote tunnel.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

if os.environ.get("BENCH_LOG_COMPILES"):
    jax.config.update("jax_log_compiles", True)

BASELINE_PROVE_S = 330.0  # README.md:11 (same workload, 24-core CPU)
BASELINE_PERMS_S = 0.22e6  # derived reference Poseidon2 rate (BASELINE.md)

# --- speed-of-light model (documented so the % figures are checkable) -----
# TPU v5e TensorCore VPU: 4 SIMD subunits x (8x128) lanes x ~1.5 GHz
# (clock back-derived from the public 197 bf16 TFLOP/s with 4 128x128 MXUs:
# 197e12 / (4*128*128*2) ~= 1.5e9).  1 u32 op / lane / cycle.
V5E_VPU_OPS = 4 * 8 * 128 * 1.5e9  # ~6.1e12 u32 ops/s


def _perm_op_model(rounds_f: int, rounds_p: int) -> float:
    """Analytic u32-op count of one width-3 Poseidon2 permutation in the
    Pallas kernel (kernels/pallas_poseidon2.py): per 16x16-limb CIOS multiply
    ~256 products x (mult+mask+shift+2 adds) + ~610 reduction/carry ops;
    squaring halves the schoolbook half.  S-box x^11 = 3 sqr + 2 mul."""
    mul_ops = 256 * 5 + 610
    sqr_ops = 136 * 5 + 80 + 33 + 610
    sbox = 3 * sqr_ops + 2 * mul_ops
    n_sbox = rounds_f * 3 + rounds_p
    linear = (rounds_f + rounds_p) * 4 * 16 * 3  # ext/int adds + carries
    return n_sbox * sbox + linear


def _butterfly_op_model() -> float:
    """u32 ops per radix-2 butterfly: one CIOS multiply + add + sub."""
    return (256 * 5 + 610) + 2 * 130


def kernel_microbench():
    """Poseidon2 perms/s/chip and NTT butterflies/s/chip vs the VPU model
    (the BASELINE.json 'metric' line).  Returns a dict merged into the
    headline JSON."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from linea_stark_tpu.hash.poseidon2 import DEFAULT_PARAMS
    from linea_stark_tpu.kernels import pallas_poseidon2 as pk
    from linea_stark_tpu.ntt import ntt

    out = {}
    n = 1 << 21
    # valid field elements: random 16-bit limbs with the top limb masked to
    # 12 bits (< r; canonical-range correctness is irrelevant to timing)
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    limbs[15] &= 0x0FFF
    a = jnp.asarray(limbs)
    b = jnp.roll(a, 1, axis=-1)
    np.asarray(pk.compress(a, b)[..., :1])  # compile + real sync
    t0 = time.time()
    iters = 4
    for _ in range(iters):
        d = pk.compress(a, b)
    np.asarray(d[..., :1])  # axon block_until_ready does not actually wait
    dt = time.time() - t0
    perms_s = n * iters / dt
    sol = V5E_VPU_OPS / _perm_op_model(
        DEFAULT_PARAMS.rounds_f, DEFAULT_PARAMS.rounds_p
    )
    out["poseidon2_mperms_s"] = round(perms_s / 1e6, 2)
    out["poseidon2_pct_sol"] = round(100 * perms_s / sol, 1)
    print(
        f"Poseidon2 kernel: {perms_s/1e6:.2f}M perms/s/chip "
        f"({out['poseidon2_pct_sol']}% of VPU model SoL {sol/1e6:.0f}M; "
        f"reference CPU {BASELINE_PERMS_S/1e6:.2f}M)",
        file=sys.stderr,
    )

    # Production LDE shape: 8 batched transforms (the trace commit's iNTT
    # half; a C=1 single transform takes an unshared slow path and
    # misrepresents the pipeline).  Jitted whole, as the prove phases run
    # it — the eager per-stage chain is dispatch-latency-bound on the
    # remote backend and under-reports by ~10x.
    m = n // 8
    x = jnp.asarray(limbs).reshape(16, 8, m)
    ntt_j = jax.jit(ntt)
    np.asarray(ntt_j(x)[..., :1])  # compile + real sync (axon block_until_ready is lazy)
    t0 = time.time()
    for _ in range(2):
        y = ntt_j(x)
    np.asarray(y[..., :1])
    dt = (time.time() - t0) / 2
    btf = 8 * (m // 2) * (m.bit_length() - 1)
    btf_s = btf / dt
    sol_b = V5E_VPU_OPS / _butterfly_op_model()
    out["ntt_gbutterflies_s"] = round(btf_s / 1e9, 2)
    out["ntt_pct_sol"] = round(100 * btf_s / sol_b, 1)
    print(
        f"NTT kernel: 8x2^{m.bit_length()-1}-point batch {dt*1e3:.1f}ms = "
        f"{btf_s/1e9:.2f}G butterflies/s/chip "
        f"({out['ntt_pct_sol']}% of VPU model SoL {sol_b/1e9:.2f}G)",
        file=sys.stderr,
    )
    return out


def main() -> int:
    log_h = int(os.environ.get("BENCH_LOG_HEIGHT", "19"))
    width = int(os.environ.get("BENCH_WIDTH", "3"))
    queries = int(os.environ.get("BENCH_QUERIES", "33"))
    pow_bits = int(os.environ.get("BENCH_POW_BITS", "0"))
    log_blowup = int(os.environ.get("BENCH_LOG_BLOWUP", "3"))
    workload = os.environ.get("BENCH_WORKLOAD", "perm")  # perm | lookup
    hasher = os.environ.get("BENCH_HASHER", "poseidon2")  # poseidon2 | keccak
    transcript = os.environ.get("BENCH_TRANSCRIPT", "native")  # native | p3
    height = 1 << log_h

    from linea_stark_tpu.challenger import HashChallenger
    from linea_stark_tpu.config import FriConfig, StarkConfig
    from linea_stark_tpu.field.constants import R_MOD
    from linea_stark_tpu.prover import prove, verify
    from linea_stark_tpu.trace import (
        build_trace,
        gen_lookup_trace,
        gen_permutation_trace,
    )
    from linea_stark_tpu.utils import timing

    import random

    rng = random.Random(0xBE7C4)
    alpha, delta = rng.randrange(R_MOD), rng.randrange(R_MOD)

    config = StarkConfig(
        fri=FriConfig(log_blowup=log_blowup, log_final_poly_len=0,
                      num_queries=queries, proof_of_work_bits=pow_bits),
        hasher=hasher,
        transcript=transcript,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(
        f"workload: {width}x{width} x 2^{log_h} {workload} AIR "
        f"(blowup 2^{log_blowup}, {hasher}, {transcript} transcript)",
        file=sys.stderr,
    )

    t0 = time.time()
    if workload == "lookup":
        raw = gen_lookup_trace(width, height, num_b_tables=1, seed=7)
        built = build_trace([], [raw], alpha, delta, check=False)
    else:
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
    verify_s = time.time() - t0
    print(f"verify: {verify_s:.2f}s (ok)", file=sys.stderr)

    kernel_stats = {}
    if os.environ.get("BENCH_KERNELS", "1") == "1":
        try:
            kernel_stats = kernel_microbench()
        except Exception as e:  # never let the sub-metric kill the headline
            print(f"kernel microbench failed: {e!r}", file=sys.stderr)

    if pow_bits > 0:
        grind_s = timing.span_seconds("grind PoW")
        if grind_s:
            # The device grind evaluates whole candidate batches, so the work
            # actually performed is the witness's batch count rounded up.
            from linea_stark_tpu.fri.grind import DEFAULT_BATCH

            # +2: the pipelined grind keeps one extra batch in flight
            batches = proof.fri.pow_witness // DEFAULT_BATCH + 2
            perms = batches * DEFAULT_BATCH
            print(
                f"PoW grind: {pow_bits} bits, witness {proof.fri.pow_witness}, "
                f"{perms / grind_s / 1e6:.2f}M perms/s device throughput "
                f"(reference CPU 0.22M perms/s)",
                file=sys.stderr,
            )

    wl = "permutation" if workload == "perm" else workload
    if transcript != "native":
        wl = f"{wl}_{transcript}"
    print(json.dumps({
        "metric": f"prove_{wl}_{width}x{width}_2^{log_h}",
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_PROVE_S / prove_s, 2),
        "verify_s": round(verify_s, 3),
        **kernel_stats,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
