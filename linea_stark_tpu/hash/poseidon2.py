"""Poseidon2 permutation (width 3) over BLS12-377 Fr.

Replaces the reference's ``Poseidon2Bls12337<3>`` (bin/src/config.rs:11;
p3-poseidon2 fork crate, SURVEY.md §2b).  Round structure matches the
reference instantiation: 8 external + 22 internal rounds
(``Perm::new_from_rng(8, 22, &mut rng)``, bin/src/main.rs:49).

S-box: x^11 — the smallest exponent coprime to r-1 for this field (3, 5, 7
and 13 all divide r-1, so x^5/x^7 are not permutations of Fr).

Round constants: the reference samples them from ``thread_rng`` at startup,
so even two reference runs disagree (SURVEY.md §5.9.2).  Here they are
derived deterministically from a seed via SHA-256 (so proofs are reproducible
and prover/verifier agree), and a full constant set can be injected instead
to match externally captured vectors.

Matrices (Poseidon2 paper, t = 3):
    external  M_E = circ(2,1,1):        y_i = x_i + (x_0+x_1+x_2)
    internal  M_I = [[2,1,1],[1,2,1],[1,1,3]]:  y_i = d_i·x_i + s,  d = (1,1,2)

Both are add-only (plus one doubling), so the permutation cost is dominated
by the 5-multiply x^11 chains — 230 field multiplies per permutation.  The
device path vectorizes one permutation across every lane of the batch axis;
the Merkle layer feeds it 2^22 states at once.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp

from ..field import fr, oracle
from ..field.constants import POSEIDON2_ALPHA, R_MOD

WIDTH = 3
RATE = 2
OUT = 1
DEFAULT_ROUNDS_F = 8
DEFAULT_ROUNDS_P = 22
DEFAULT_SEED = b"linea-stark-tpu/poseidon2/bls12-377-fr/t3/v1"


def derive_round_constants(
    seed: bytes = DEFAULT_SEED,
    rounds_f: int = DEFAULT_ROUNDS_F,
    rounds_p: int = DEFAULT_ROUNDS_P,
) -> list:
    """Deterministic constant schedule: SHA-256(seed || counter) mod r.

    The modulo bias is ~2^-3 per draw (r is a 253-bit prime) which is
    irrelevant for constant generation; we keep the simple rule so any
    implementation can reproduce it from the seed alone.
    """
    n = rounds_f * WIDTH + rounds_p
    out = []
    for i in range(n):
        h = hashlib.sha256(seed + i.to_bytes(4, "little")).digest()
        out.append(int.from_bytes(h, "big") % R_MOD)
    return out


@dataclass(frozen=True)
class Poseidon2Params:
    """Full permutation specification (hashable: usable as a jit static)."""

    rounds_f: int = DEFAULT_ROUNDS_F
    rounds_p: int = DEFAULT_ROUNDS_P
    alpha: int = POSEIDON2_ALPHA
    constants: tuple = field(
        default_factory=lambda: tuple(derive_round_constants())
    )

    def __post_init__(self):
        assert self.rounds_f % 2 == 0
        assert len(self.constants) == self.rounds_f * WIDTH + self.rounds_p

    @classmethod
    def from_json(cls, path: str) -> "Poseidon2Params":
        """Load injected constants (e.g. captured from a reference run)."""
        with open(path) as f:
            d = json.load(f)
        return cls(
            rounds_f=d.get("rounds_f", DEFAULT_ROUNDS_F),
            rounds_p=d.get("rounds_p", DEFAULT_ROUNDS_P),
            alpha=d.get("alpha", POSEIDON2_ALPHA),
            constants=tuple(int(c) for c in d["constants"]),
        )

    def external_constants(self, half: int) -> list:
        """3-element constant rows for the first/second half of external rounds."""
        rf2 = self.rounds_f // 2
        base = 0 if half == 0 else rf2 * WIDTH + self.rounds_p
        return [
            self.constants[base + r * WIDTH : base + (r + 1) * WIDTH]
            for r in range(rf2)
        ]

    def internal_constants(self) -> list:
        base = (self.rounds_f // 2) * WIDTH
        return list(self.constants[base : base + self.rounds_p])


DEFAULT_PARAMS = Poseidon2Params()


# ---------------------------------------------------------------------------
# Host oracle (Python ints) — used by the Fiat-Shamir challenger and tests
# ---------------------------------------------------------------------------

def _sbox_int(x: int, alpha: int) -> int:
    return pow(x, alpha, R_MOD)


def _external_int(s):
    t = (s[0] + s[1] + s[2]) % R_MOD
    return [(x + t) % R_MOD for x in s]


def _internal_int(s):
    t = (s[0] + s[1] + s[2]) % R_MOD
    return [(s[0] + t) % R_MOD, (s[1] + t) % R_MOD, (2 * s[2] + t) % R_MOD]


def permute_ints(state: Sequence[int], params: Poseidon2Params = DEFAULT_PARAMS) -> list:
    s = [x % R_MOD for x in state]
    assert len(s) == WIDTH
    s = _external_int(s)
    for rc in params.external_constants(0):
        s = [_sbox_int((x + c) % R_MOD, params.alpha) for x, c in zip(s, rc)]
        s = _external_int(s)
    for c in params.internal_constants():
        s = [_sbox_int((s[0] + c) % R_MOD, params.alpha)] + list(s[1:])
        s = _internal_int(s)
    for rc in params.external_constants(1):
        s = [_sbox_int((x + c) % R_MOD, params.alpha) for x, c in zip(s, rc)]
        s = _external_int(s)
    return s


def hash_ints(inputs: Sequence[int], params: Poseidon2Params = DEFAULT_PARAMS) -> int:
    """PaddingFreeSponge(width 3, rate 2, out 1) over Python ints.

    Overwrite-absorb semantics: each chunk of <=2 inputs overwrites the rate
    portion of the state, then the state is permuted — including for the
    final (possibly partial) chunk.  Zero-length input hashes to 0 (state is
    never permuted).  Mirrors ``PaddingFreeSponge<Perm, 3, 2, 1>``
    (bin/src/config.rs:12).
    """
    state = [0] * WIDTH
    vals = [x % R_MOD for x in inputs]
    for i in range(0, len(vals), RATE):
        chunk = vals[i : i + RATE]
        state[: len(chunk)] = chunk
        state = permute_ints(state, params)
    return state[0]


def compress_ints(a: int, b: int, params: Poseidon2Params = DEFAULT_PARAMS) -> int:
    """2-to-1 compression = hash of the pair (CompressionFunctionFromHasher,
    bin/src/config.rs:17): one permutation of (a, b, 0)."""
    return hash_ints([a, b], params)


# ---------------------------------------------------------------------------
# Device path (vectorized over arbitrary batch shape)
# ---------------------------------------------------------------------------

def _sbox(x: jax.Array, alpha: int) -> jax.Array:
    return fr.pow_const(x, alpha)


def _external(s0, s1, s2):
    t = fr.add(fr.add(s0, s1), s2)
    return fr.add(s0, t), fr.add(s1, t), fr.add(s2, t)


def _internal(s0, s1, s2):
    t = fr.add(fr.add(s0, s1), s2)
    return fr.add(s0, t), fr.add(s1, t), fr.add(fr.double(s2), t)


def _mont_const_rows(rows) -> jnp.ndarray:
    """[[ints]] -> (R, C, 16) uint32 Montgomery limb array (device)."""
    import numpy as np

    from ..field.constants import to_limbs

    arr = np.stack(
        [np.stack([to_limbs(oracle.to_mont(c)) for c in row]) for row in rows]
    )
    return jnp.asarray(arr)


import functools


@functools.lru_cache(maxsize=8)
def _round_schedule(params: Poseidon2Params):
    """Host-precomputed per-round (constants, is_external) arrays.

    Returns (rc, flags): rc is (R, 16, 3) Montgomery limb constants (internal
    rounds pad lanes 1-2 with zero — adding 0 is the identity), flags is (R,)
    uint32 with 1 for external rounds.
    """
    import numpy as np

    from ..field.constants import to_limbs

    rows = []
    flags = []
    for rc3 in params.external_constants(0):
        rows.append(list(rc3))
        flags.append(1)
    for c in params.internal_constants():
        rows.append([c, 0, 0])
        flags.append(0)
    for rc3 in params.external_constants(1):
        rows.append(list(rc3))
        flags.append(1)
    rc = np.zeros((len(rows), 16, WIDTH), dtype=np.uint32)
    for r, row in enumerate(rows):
        for lane, c in enumerate(row):
            # 0 must stay 0 in the additive position (Montgomery 0 is 0).
            limbs = to_limbs(oracle.to_mont(c)) if c else to_limbs(0)
            rc[r, :, lane] = limbs
    # Cache numpy, not device arrays: a device array created during a jit
    # trace would leak that trace's tracer into later calls.
    return rc, np.asarray(flags, dtype=np.uint32)


def permute(
    s0: jax.Array,
    s1: jax.Array,
    s2: jax.Array,
    params: Poseidon2Params = DEFAULT_PARAMS,
):
    """Vectorized permutation of a batch of states; each s_i is (16, *batch).

    All 46 rounds run as ONE ``lax.scan`` over a unified round body: the
    traced graph holds a single x^11 S-box chain (5 field multiplies) plus
    lane selects, instead of 46 unrolled rounds (or separate external /
    internal bodies).  Compile time of the XLA limb graphs is the binding
    constraint off-TPU (the Pallas kernel owns the TPU hot path); internal
    rounds waste the S-box work of lanes 1-2, which is irrelevant there.
    """
    alpha = params.alpha
    rc_np, flags_np = _round_schedule(params)
    rc_all, flags = jnp.asarray(rc_np), jnp.asarray(flags_np)
    batch = s0.shape[1:]
    x = jnp.stack([s0, s1, s2], axis=1)  # (16, 3, *batch)

    def matmul_ext(v):
        t = fr.add(fr.add(v[:, 0], v[:, 1]), v[:, 2])
        return jnp.stack([fr.add(v[:, 0], t), fr.add(v[:, 1], t), fr.add(v[:, 2], t)], axis=1)

    def body(v, xs):
        rc, is_ext = xs  # rc: (16, 3); is_ext: scalar uint32
        ext_mask = jnp.broadcast_to(is_ext.astype(jnp.bool_), batch)
        h = _sbox(fr.add(v, rc.reshape((16, WIDTH) + (1,) * len(batch))), alpha)
        lane0 = h[:, 0]
        lane1 = fr.select(ext_mask, h[:, 1], v[:, 1])
        lane2 = fr.select(ext_mask, h[:, 2], v[:, 2])
        t = fr.add(fr.add(lane0, lane1), lane2)
        y0 = fr.add(lane0, t)
        y1 = fr.add(lane1, t)
        # internal matrix doubles lane 2 (M_I diag d = (1,1,2)).
        extra = fr.select(ext_mask, fr.zeros(batch), lane2)
        y2 = fr.add(fr.add(lane2, extra), t)
        return jnp.stack([y0, y1, y2], axis=1), None

    x = matmul_ext(x)
    x, _ = jax.lax.scan(body, x, (rc_all, flags))
    return x[:, 0], x[:, 1], x[:, 2]


def hash_columns(
    columns: Sequence[jax.Array], params: Poseidon2Params = DEFAULT_PARAMS
) -> jax.Array:
    """Sponge-hash W columns of (16, N) values into one (16, N) digest column.

    This is the Merkle leaf row-hash: for each row index n, the W values
    columns[0..W)[n] are absorbed rate-2 into the sponge.  All N rows hash in
    parallel — the reference does ceil(W/2)·N sequential permutations here
    (~75% of its prove time, bench.log:19).
    """
    assert len(columns) >= 1
    batch_shape = columns[0].shape[1:]
    s0 = fr.zeros(batch_shape)
    s1 = fr.zeros(batch_shape)
    s2 = fr.zeros(batch_shape)
    for i in range(0, len(columns), RATE):
        chunk = columns[i : i + RATE]
        s0 = chunk[0]
        if len(chunk) > 1:
            s1 = chunk[1]
        s0, s1, s2 = permute(s0, s1, s2, params)
    return s0


def compress(
    left: jax.Array, right: jax.Array, params: Poseidon2Params = DEFAULT_PARAMS
) -> jax.Array:
    """Vectorized 2-to-1 digest compression: (16, N) x2 -> (16, N)."""
    zero = fr.zeros(left.shape[1:])
    s0, _, _ = permute(left, right, zero, params)
    return s0
