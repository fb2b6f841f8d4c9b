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

import jax.numpy as jnp
import numpy as np

from ..backend import use_pallas
from ..field import fr, oracle
from ..field.constants import NUM_LIMBS, R_MOD
from ..hash import poseidon2 as p2

U32 = jnp.uint32
DEFAULT_BATCH = 1 << 21


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


def _candidates_mont(start: int, batch: int):
    """(16, batch) Montgomery limbs of the integers [start, start+batch)."""
    from .. import fr_ops as fo

    w = jnp.arange(start, start + batch, dtype=jnp.uint32)
    limbs = [w & U32(0xFFFF), w >> 16] + [jnp.zeros_like(w)] * (NUM_LIMBS - 2)
    # start + batch stays far below r, so raw limbs are canonical.
    return fo.to_mont(jnp.stack(limbs, axis=0))


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
    mask = (1 << bits) - 1

    def mont_full(v: int, shape):
        return fr.full(shape, v)

    start = 0
    while True:
        wv = _candidates_mont(start, batch)
        shape = (batch,)
        if partner is None:
            s0 = wv
            s1 = mont_full(state[1], shape)
        else:
            s0 = mont_full(partner, shape)
            s1 = wv
        s2 = mont_full(state[2], shape)
        if use_pallas():
            from ..kernels import pallas_poseidon2 as pk

            d0, _, _ = pk.permute(s0, s1, s2, params)
        else:  # pragma: no cover - exercised via host fallback above
            d0, _, _ = p2.permute(s0, s1, s2, params)
        canon = fr.from_mont(d0)
        low = canon[0].astype(jnp.uint32) | (canon[1].astype(jnp.uint32) << 16)
        if bits <= 32:
            ok = (low & U32(mask)) == 0
        else:
            hi = canon[2].astype(jnp.uint32) | (canon[3].astype(jnp.uint32) << 16)
            ok = ((low & U32(mask & 0xFFFFFFFF)) == 0) & (
                (hi & U32(mask >> 32)) == 0
            )
        hits = np.asarray(jnp.nonzero(ok, size=1, fill_value=batch)[0])
        if hits[0] < batch:
            w = start + int(hits[0])
            assert challenger.check_witness(bits, w), "grind winner re-check"
            return w
        start += batch
        if start >= 1 << 48:  # pragma: no cover
            raise RuntimeError("grind failed")
