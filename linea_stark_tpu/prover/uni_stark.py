"""Uni-STARK prove/verify over the two-adic FRI PCS.

TPU-native re-design of p3-uni-stark (bin/src/main.rs:80-96; pipeline
structure and cost profile in SURVEY.md §3.3).  All PCS mechanics (LDE,
Merkle, opening reduction, FRI) live behind the ``pcs`` seam
(pcs/two_adic_fri.py — the ``TwoAdicFriPcs`` analog of bin/src/config.rs:24);
this module owns the transcript orchestration, the quotient computation, and
the AIR-level verification.

Transcript orders (challenger fresh per prove/verify, bin/src/main.rs:78,88):

``native`` (this framework's default):

    observe(log_n); observe(width); observe(trace_root)
    observe(alpha); observe(delta)                  # public values
    gamma   = sample()                              # constraint folding
    observe(quotient_root)
    zeta    = sample()                              # out-of-domain point
    observe(trace@zeta ..W); observe(trace@zeta·g ..W); observe(chunks@zeta)
    alpha_p = sample()                              # opening reduction
    for each fold level: beta_l = sample(); [commit folded; observe root]
    observe(final_poly coefficients); pow grind; query indices (log_lde-1 bits)

``p3`` (upstream p3-uni-stark order, PARITY.md §3):

    observe(log_n); observe(trace_root)
    observe(alpha); observe(delta)                  # observe_slice(publics)
    gamma   = sample()
    observe(quotient_root)
    zeta    = sample()
    alpha_p = sample()                              # sampled BEFORE openings
    for each fold level: commit current codeword; observe root; beta_l = sample()
    observe(final_poly); pow grind; query indices (log_lde bits, bit-reversed)

Quotient decomposition: the quotient is evaluated on the first C cosets of
the LDE domain; chunk i carries the values at indices ≡ i mod blowup — a
polynomial of degree < n on coset c_i = shift·ω^i.  C is degree-aware in
native mode (4× less committed data for the degree-3 gadgets) and
2^log_blowup in p3 mode (the reference commits 8 chunks of 1×2^19,
bench.log:22-30).  The verifier recomposes
q(ζ) = Σ_i q_i(ζ)·Π_{j≠i}(ζ^n − c_j^n)/(c_i^n − c_j^n).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import fr_ops as fo
from ..air.algebra import ScalarAlgebra, VectorAlgebra
from ..air.gadgets import LineaAir, Sel
from ..challenger import HashChallenger
from ..config import StarkConfig
from ..field import fr, oracle
from ..field.constants import NUM_LIMBS, R_MOD
from ..ntt.ntt import _powers_device, root_of_unity
import functools

from ..pcs import make_pcs
from ..pcs.two_adic_fri import (  # noqa: F401  (re-exported for dist/debug)
    VerificationError,
    _fused,
    _interpolate_host,
    _mont_scalar,
    default_host_tail,
)

from ..utils.export_cache import export_cached_jit
from ..utils.timing import span
from .proof import Proof


@export_cached_jit(name="quotient",
                   static_argnames=("air", "n", "shift", "n_chunks",
                                    "coset0"))
def _quotient_jit(trace_lde, air, alpha_s, delta_s, gamma_s, n, shift,
                  n_chunks, coset0=0):
    """Whole quotient evaluation as ONE program (challenges as (16,)
    Montgomery device scalars so no per-proof retrace; LineaAir is frozen
    and rides as a jit static).  Streamed heights call it once per coset
    (``coset0``) so each program's working set stays single-coset."""
    return compute_quotient(
        trace_lde, air, alpha_s, delta_s, gamma_s, n, shift, n_chunks,
        coset0,
    )


@functools.partial(jax.jit, static_argnames=("air", "n", "shift", "n_chunks"))
def _quotient_plain_jit(trace_lde, air, alpha_s, delta_s, gamma_s, n, shift,
                        n_chunks):
    """Plain-jit twin of :func:`_quotient_jit` for the sharded (GSPMD) path —
    the export cache serializes single-device modules only."""
    return compute_quotient(
        trace_lde, air, alpha_s, delta_s, gamma_s, n, shift, n_chunks
    )


def _selector_factors(sel: Sel, zeta: int, n: int, z_h: int, omega_n: int) -> int:
    """Scalar Z-compensated selector factors at ζ (see quotient notes)."""
    last = pow(omega_n, n - 1, R_MOD)
    if sel == Sel.EVERY:
        return 1
    if sel == Sel.FIRST:
        return oracle.mul(z_h, oracle.inv(oracle.sub(zeta, 1)))
    if sel == Sel.LAST:
        return oracle.mul(z_h, oracle.inv(oracle.sub(zeta, last)))
    return oracle.sub(zeta, last)  # TRANSITION


# ---------------------------------------------------------------------------
# Quotient
# ---------------------------------------------------------------------------

def num_quotient_chunks(air: LineaAir) -> int:
    """Degree-aware chunk count: the quotient has degree
    < (max_deg−1)·n (numerator ≤ max_deg·(n−1)+1 minus the vanishing n), so
    ⌈(max_deg−1)⌉ rounded up to a power of two cosets determine it — the
    verifier infers the same count from the AIR (the reference's "infer log
    of constraint degree", bench.log:70)."""
    deg = max(air.max_constraint_degree, 2)
    c = 1
    while c < deg - 1:
        c *= 2
    return c


def quotient_chunk_count(config: StarkConfig, air: LineaAir) -> int:
    """Chunk-count policy: explicit override > mode default (degree-aware
    for native, blowup for p3 — the reference's 8 chunks, bench.log:22-30)."""
    if config.quotient_chunks is not None:
        c = config.quotient_chunks
        assert c & (c - 1) == 0 and c <= config.fri.blowup
        return c
    if config.transcript == "p3":
        return config.fri.blowup
    return num_quotient_chunks(air)


def compute_quotient(
    trace_lde: jax.Array,
    air: LineaAir,
    alpha: int,
    delta: int,
    gamma: int,
    n: int,
    shift: int,
    n_chunks: int = None,
    coset0: int = 0,
) -> jax.Array:
    """Vectorized constraint evaluation -> quotient evals, coset-major.

    Only the first ``n_chunks`` cosets of the LDE domain are evaluated (the
    quotient's degree needs no more, see :func:`num_quotient_chunks`) — a
    blowup/n_chunks-fold saving over evaluating the whole LDE domain.  Input
    ``trace_lde``: (16, W, n_lde) interleaved evals on shift·H_lde.  Output:
    (16, n_chunks, n) where slice i holds the quotient's values on coset
    shift·ω_lde^i·H_n — exactly the chunk-poly evaluations to commit.

    ``next`` row access is a roll by one position along the coset's own
    n-point axis (one original-domain step).  Constraints are folded with
    γ^k in enumeration order, grouped by selector so each selector /
    vanishing factor multiplies one accumulated vector (bench.log:21).
    """
    n_lde = trace_lde.shape[-1]
    blowup = n_lde // n
    if n_chunks is None:
        n_chunks = num_quotient_chunks(air)
    assert n_chunks <= blowup
    c = n_chunks
    log_lde = n_lde.bit_length() - 1
    omega_lde = root_of_unity(log_lde)
    omega_n = root_of_unity(n.bit_length() - 1)

    # (16, W, n_lde) interleaved -> (16, W, C, n) coset-major subsample.
    # Strided slices keep the big n axis minor-most: a reshape to
    # (..., n, blowup) would make the tiny blowup axis minor and TPU tiling
    # pads minor dims to 128 lanes — an 8-64x padded transposed copy that
    # OOMs HBM at the 2^19 workload.  A streamed (LazyLde) trace derives
    # each coset's evals from the retained coefficients instead (position
    # j ≡ i mod blowup of the natural-order LDE is coset shift·ω_lde^i·H_n
    # in natural order) and evaluates ONE COSET AT A TIME — the stacked
    # (16, W, C, n) view alone is gigabytes at the streamed heights.
    from ..pcs.streaming import LazyLde

    if isinstance(trace_lde, LazyLde):
        if c > 1:
            parts = []
            for i in range(c):
                lde_i = trace_lde
                if parts:
                    # serialize the per-coset subgraphs: they are
                    # data-independent, and XLA's scheduler otherwise
                    # overlaps them — two ~13 GB working sets at once
                    coeffs_b = jax.lax.optimization_barrier(
                        (trace_lde.coeffs, parts[-1])
                    )[0]
                    lde_i = LazyLde(
                        coeffs_b, trace_lde.log_blowup, trace_lde.shift,
                        trace_lde.group,
                    )
                parts.append(
                    compute_quotient(
                        lde_i, air, alpha, delta, gamma, n, shift,
                        n_chunks=1, coset0=i,
                    )
                )
            return jnp.concatenate(parts, axis=1)
        sub = trace_lde.coset_evals(coset0)[:, :, None, :]
    else:
        assert coset0 == 0
        sub = jnp.stack(
            [trace_lde[..., i::blowup] for i in range(c)], axis=2
        )  # (16, W, C, n)

    # Challenges may be host ints (single-chip eager path) or (16,) device
    # scalars (the sharded jitted path — baking them as trace constants
    # would poison the jit cache across proves).
    def _bcast(v):
        if isinstance(v, int):
            return fr.full((c, n), v)
        return jnp.broadcast_to(v[:, None, None], (NUM_LIMBS, c, n))

    alg = VectorAlgebra((c, n))
    alpha_d = _bcast(alpha)
    delta_d = _bcast(delta)

    # `next` row = cyclic shift by one position along each coset's own
    # n-point axis.  Materialized lazily PER COLUMN (a concat of two
    # slices) instead of rolling the whole (16, W, C, n) table — the full
    # rolled copy alone is gigabytes at streamed heights.
    local = lambda i: sub[:, i]

    def nxt(i):
        col = sub[:, i]
        return jnp.concatenate([col[..., 1:], col[..., :1]], axis=-1)

    acc = {s: None for s in Sel}
    gk = 1 if isinstance(gamma, int) else fr.ones(())
    for sel, val in air.eval(local, nxt, alpha_d, delta_d, alg):
        if isinstance(gamma, int):
            term = fo.mul_const(val, gk)
            gk_next = oracle.mul(gk, gamma)
        else:
            term = fo.mul_scalar_arr(val, gk)
            gk_next = fr.mul(gk, gamma)
        acc[sel] = term if acc[sel] is None else fo.add(acc[sel], term)
        gk = gk_next

    # Domain: x[i, t] = shift·ω_lde^{coset0+i}·ω_n^t (coset i, position t).
    shift_eff = (shift * pow(omega_lde, coset0, R_MOD)) % R_MOD
    coset_shifts = fo.mul_const(_powers_device(omega_lde, c), shift_eff)
    x_vec = fo.mul(coset_shifts[:, :, None], _powers_device(omega_n, n)[:, None, :])
    # Z_H(x) = x^n − 1 is constant on each coset.
    s_n = pow(shift, n, R_MOD)
    omega_b = pow(omega_lde, n, R_MOD)  # order `blowup`
    inv_z = jnp.asarray(
        fr.pack_ints(
            [
                oracle.inv(
                    oracle.sub(
                        oracle.mul(s_n, pow(omega_b, coset0 + i, R_MOD)), 1
                    )
                )
                for i in range(c)
            ]
        )
    )[:, :, None]  # (16, C, 1)
    last = pow(omega_n, n - 1, R_MOD)
    one_v = fr.ones((c, n))
    x_minus_last = fo.sub(x_vec, fr.full((c, n), last))
    # One fused inversion for both selector denominators.
    sel_stack = jnp.concatenate(
        [fo.sub(x_vec, one_v), x_minus_last], axis=-1
    ).reshape(NUM_LIMBS, 2 * c * n)
    sel_inv = fo.batch_inverse(sel_stack).reshape(NUM_LIMBS, c, 2 * n)
    x_minus_1_inv = sel_inv[..., :n]
    x_minus_last_inv = sel_inv[..., n:]

    q = fr.zeros((c, n))
    if acc[Sel.EVERY] is not None:
        q = fo.add(q, fo.mul(acc[Sel.EVERY], inv_z))
    if acc[Sel.FIRST] is not None:
        q = fo.add(q, fo.mul(acc[Sel.FIRST], x_minus_1_inv))
    if acc[Sel.LAST] is not None:
        q = fo.add(q, fo.mul(acc[Sel.LAST], x_minus_last_inv))
    if acc[Sel.TRANSITION] is not None:
        t = fo.mul(acc[Sel.TRANSITION], x_minus_last)
        q = fo.add(q, fo.mul(t, inv_z))
    return q


# ---------------------------------------------------------------------------
# Prove
# ---------------------------------------------------------------------------

def prove(
    config: StarkConfig,
    air: LineaAir,
    trace: jax.Array,
    public_values: list,
    challenger: HashChallenger,
    pcs=None,
) -> Proof:
    """trace: (16, W, n) Montgomery limbs; public_values = [alpha, delta].

    ``pcs`` overrides the PCS instance (the sharded prover passes a
    :class:`~linea_stark_tpu.dist.pcs.ShardedTwoAdicFriPcs`; one PCS seam,
    every caller — bin/src/config.rs:19-24)."""
    alpha, delta = public_values
    if pcs is None:
        pcs = make_pcs(config)
    p3 = config.transcript == "p3"

    w = trace.shape[1]
    n = trace.shape[-1]
    log_n = n.bit_length() - 1
    omega_n = root_of_unity(log_n)

    # --- commit to trace data (bench.log:19) -------------------------------
    with span("commit trace", dims=f"{w}x{n}", added_bits=config.fri.log_blowup):
        trace_root, trace_data = pcs.commit_trace(trace)

    challenger.observe(log_n)
    if not p3:
        challenger.observe(w)
    challenger.observe(trace_root)
    challenger.observe(alpha)
    challenger.observe(delta)
    gamma = challenger.sample()

    # --- quotient ----------------------------------------------------------
    n_chunks = quotient_chunk_count(config, air)
    with span("compute quotient polynomial", dims=f"{n_chunks}x{n}"):
        from ..pcs.streaming import LazyLde, hard_sync

        if _fused() and isinstance(trace_data.lde, LazyLde):
            # streamed heights: ONE PROGRAM PER COSET with a hard sync
            # between — a single fused program's per-coset subgraphs (or
            # two queued programs) put two ~7 GB working sets in HBM at
            # once
            parts = []
            for i in range(n_chunks):
                parts.append(
                    hard_sync(
                        _quotient_jit(
                            trace_data.lde, air,
                            _mont_scalar(alpha), _mont_scalar(delta),
                            _mont_scalar(gamma), n, config.coset_shift, 1, i,
                        )
                    )
                )
            chunks = (
                parts[0] if n_chunks == 1
                else jnp.concatenate(parts, axis=1)
            )
        elif _fused():
            chunks = _quotient_jit(
                trace_data.lde, air,
                _mont_scalar(alpha), _mont_scalar(delta), _mont_scalar(gamma),
                n, config.coset_shift, n_chunks,
            )
        elif getattr(pcs, "mesh", None) is not None:
            # sharded path: one jitted program so GSPMD partitions the
            # whole evaluation (eager dispatch per op would serialize)
            chunks = _quotient_plain_jit(
                trace_data.lde, air,
                _mont_scalar(alpha), _mont_scalar(delta), _mont_scalar(gamma),
                n, config.coset_shift, n_chunks,
            )
        else:
            chunks = compute_quotient(
                trace_data.lde, air, alpha, delta, gamma, n,
                config.coset_shift, n_chunks=n_chunks,
            )

    with span("commit quotient chunks"):
        quotient_root, quot_data = pcs.commit_quotient(chunks)
        del chunks

    challenger.observe(quotient_root)
    zeta = challenger.sample()
    zeta_next = oracle.mul(zeta, omega_n)

    # --- open + FRI (bench.log:31,63) --------------------------------------
    trace_at_zeta, trace_at_zeta_next, chunks_at_zeta, fri_proof = pcs.open(
        trace_data, quot_data, zeta, zeta_next, challenger
    )

    return Proof(
        log_n=log_n,
        width=w,
        trace_root=trace_root,
        quotient_root=quotient_root,
        trace_at_zeta=trace_at_zeta,
        trace_at_zeta_next=trace_at_zeta_next,
        quotient_chunks_at_zeta=chunks_at_zeta,
        fri=fri_proof,
        transcript=config.transcript,
    )


# ---------------------------------------------------------------------------
# Verify
# ---------------------------------------------------------------------------

def verify(
    config: StarkConfig,
    air: LineaAir,
    proof: Proof,
    public_values: list,
    challenger: HashChallenger,
) -> None:
    """Raises VerificationError on any failed check (scalar, host-side)."""
    alpha, delta = public_values
    pcs = make_pcs(config)
    p3 = config.transcript == "p3"
    if proof.transcript != config.transcript:
        raise VerificationError("proof transcript mode mismatch")
    shift = config.coset_shift

    n = 1 << proof.log_n
    w = proof.width
    if w != air.width:
        raise VerificationError("width mismatch with AIR")
    log_lde = proof.log_n + config.fri.log_blowup
    n_lde = 1 << log_lde
    omega_lde = root_of_unity(log_lde)
    omega_n = root_of_unity(proof.log_n)

    # --- replay transcript head -------------------------------------------
    challenger.observe(proof.log_n)
    if not p3:
        challenger.observe(w)
    challenger.observe(proof.trace_root)
    challenger.observe(alpha)
    challenger.observe(delta)
    gamma = challenger.sample()
    challenger.observe(proof.quotient_root)
    zeta = challenger.sample()
    zeta_next = oracle.mul(zeta, omega_n)

    # chunk count inferred from the AIR + config policy, mirroring the
    # reference verifier's "infer log of constraint degree" (bench.log:70)
    n_chunks = quotient_chunk_count(config, air)
    if len(proof.quotient_chunks_at_zeta) != n_chunks:
        raise VerificationError("wrong number of quotient chunks")

    # --- PCS: transcript tail + Merkle + FRI checks ------------------------
    pcs.verify(
        proof.trace_root,
        proof.quotient_root,
        ((n_lde, w), (n_lde, n_chunks)),
        (proof.trace_at_zeta, proof.trace_at_zeta_next,
         proof.quotient_chunks_at_zeta),
        zeta,
        zeta_next,
        proof.fri,
        challenger,
    )

    # --- quotient identity at ζ (AIR re-evaluation, air/src/lib.rs:48-53) --
    alg = ScalarAlgebra()
    local = lambda i: proof.trace_at_zeta[i]
    nxt = lambda i: proof.trace_at_zeta_next[i]
    z_h = oracle.sub(pow(zeta, n, R_MOD), 1)
    if z_h == 0:
        raise VerificationError("zeta in trace domain")
    folded = 0
    gk = 1
    for sel, val in air.eval(local, nxt, alpha, delta, alg):
        sf = _selector_factors(sel, zeta, n, z_h, omega_n)
        folded = oracle.add(folded, oracle.mul(oracle.mul(gk, sf), val))
        gk = oracle.mul(gk, gamma)

    s_n = pow(shift, n, R_MOD)
    omega_b = pow(omega_lde, n, R_MOD)
    c_n = [oracle.mul(s_n, pow(omega_b, i, R_MOD)) for i in range(n_chunks)]
    zeta_n = pow(zeta, n, R_MOD)
    q_zeta = 0
    for i in range(n_chunks):
        li = 1
        for j in range(n_chunks):
            if j != i:
                li = oracle.mul(
                    li,
                    oracle.mul(
                        oracle.sub(zeta_n, c_n[j]),
                        oracle.inv(oracle.sub(c_n[i], c_n[j])),
                    ),
                )
        q_zeta = oracle.add(
            q_zeta, oracle.mul(proof.quotient_chunks_at_zeta[i], li)
        )
    if folded != oracle.mul(z_h, q_zeta):
        raise VerificationError("quotient identity failed at zeta")


# ---------------------------------------------------------------------------
# Back-compat aliases (dist/prove.py and debug tooling import these)
# ---------------------------------------------------------------------------

_FRI_HOST_TAIL = default_host_tail()


def _fold_host(f, beta: int, shift_int: int, omega_int: int):
    from ..hash import np_poseidon2 as npp

    return npp.fold_vec(np.asarray(f, dtype=object), beta, shift_int, omega_int)
