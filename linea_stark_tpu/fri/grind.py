"""Vectorized proof-of-work grind for the FRI prover.

The reference grinds for a witness w such that observing w and sampling
yields ``proof_of_work_bits`` low zero bits ("grind for proof-of-work
witness", bench.log:66; FriConfig at bin/src/main.rs:58-64).  Its search is
a rayon parallel scalar loop; here candidates are searched in device batches
— one Poseidon2 permutation sweep per batch — and the winner is re-checked
through the host challenger so the transcript advances exactly as
``check_witness`` would.

Sponge layout: the challenge hash is ``hash(input_buffer + [w])`` with the
rate-2 overwrite-absorb sponge (hash/poseidon2.py:hash_ints).  Everything up
to the chunk containing w is fixed, so the device work per candidate is ONE
permutation regardless of transcript length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import use_pallas
from ..field import fr
from ..field.constants import NUM_LIMBS, to_limbs
from ..hash import poseidon2 as p2

U32 = jnp.uint32
DEFAULT_BATCH = 1 << 22


def _prefix_state(buf: list, params: p2.Poseidon2Params) -> tuple:
    """Sponge state after absorbing every full chunk before the one holding
    the witness; returns (state, fixed_partner) where fixed_partner is the
    odd leftover element sharing the witness's chunk (or None)."""
    state = [0, 0, 0]
    n_full = (len(buf) // 2) * 2
    for i in range(0, n_full, 2):
        state[0], state[1] = buf[i], buf[i + 1]
        state = p2.permute_ints(state, params)
    partner = buf[n_full] if len(buf) % 2 else None
    return state, partner


def grind(challenger, bits: int, batch: int = DEFAULT_BATCH) -> int:
    """Find and observe a witness with ``bits`` low zero sample bits.

    Device-vectorized when the Pallas backend is active; falls back to the
    challenger's host loop otherwise (tests, tiny bit counts)."""
    if bits <= 0:
        return 0
    # Host fallback only for tiny searches (2^8 hashes is ~0.3 s of Python
    # bigint sponge work; above that the device sweep wins even with its one
    # dispatch per 2^21-candidate batch).
    if not use_pallas() or bits <= 8:
        return challenger.grind(bits)

    params = challenger.params
    buf = list(challenger.input_buffer)
    state, partner = _prefix_state(buf, params)

    def _scalar(v: int):
        return jnp.asarray(fr.pack_ints([v]))[:, 0]

    f0 = _scalar(partner if partner is not None else 0)
    f1 = _scalar(state[1])
    f2 = _scalar(state[2])

    # Two batches stay in flight: the next batch's single fused dispatch is
    # issued before the previous result is fetched, so the remote round trip
    # overlaps device compute (the serial fetch-per-batch loop ran at 40% of
    # the raw permutation rate).
    start = 0
    pending = []
    while True:
        while len(pending) < 2 and start < 1 << 32:
            pending.append(
                (
                    start,
                    _grind_step(
                        jnp.uint32(start), f0, f1, f2, params, bits, batch,
                        partner is not None,
                    ),
                )
            )
            start += batch
        if not pending:  # pragma: no cover
            raise RuntimeError("grind failed (witness space exhausted)")
        base, idx_dev = pending.pop(0)
        hit = int(np.asarray(idx_dev))
        if hit < batch:
            w = base + hit
            assert challenger.check_witness(bits, w), "grind winner re-check"
            return w


@functools.partial(
    jax.jit, static_argnames=("params", "bits", "batch", "has_partner")
)
def _grind_step(start, f0, f1, f2, params, bits, batch, has_partner):
    """One candidate batch — Montgomery lift, permutation, bit test, hit
    index — as a single program.  ``start`` rides as a device scalar so
    every batch reuses one compiled executable."""
    from .. import fr_ops as fo
    from ..kernels import pallas_field as pf
    from ..kernels import pallas_poseidon2 as pk

    w = jnp.arange(batch, dtype=U32) + start
    limbs = [w & U32(0xFFFF), w >> 16] + [jnp.zeros_like(w)] * (NUM_LIMBS - 2)
    wv = fo.to_mont(jnp.stack(limbs, axis=0))

    def bc(s):
        return jnp.broadcast_to(s[:, None], (NUM_LIMBS, batch))

    if has_partner:
        s0, s1 = bc(f0), wv
    else:
        s0, s1 = wv, bc(f1)
    d0, _, _ = pk.permute(s0, s1, bc(f2), params)
    # from-Montgomery = one multiply by raw 1 (mul_const would shortcut)
    canon = pf.mul_scalar(d0, jnp.asarray(to_limbs(1)))
    mask = (1 << bits) - 1
    low = canon[0].astype(U32) | (canon[1].astype(U32) << 16)
    if bits <= 32:
        ok = (low & U32(mask)) == 0
    else:
        hi = canon[2].astype(U32) | (canon[3].astype(U32) << 16)
        ok = ((low & U32(mask & 0xFFFFFFFF)) == 0) & (
            (hi & U32(mask >> 32)) == 0
        )
    return jnp.nonzero(ok, size=1, fill_value=batch)[0][0]
