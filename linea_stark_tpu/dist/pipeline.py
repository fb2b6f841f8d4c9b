"""Row-sharded prove-core pipeline (the multi-chip "training step").

Composes the sharded primitives into one jitted step over a Mesh:
trace column building (GSPMD-partitioned scans) -> coset LDE (all_to_all
NTT) -> Merkle root (subtree all_gather) -> quotient evaluation (GSPMD
rolls) -> FRI folds (ppermute).  Challenges are passed in as ints so the
step is one compiled program with no host transcript syncs — the full prover
interleaves these phases with the Fiat-Shamir challenger exactly as the
single-chip path does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..air.gadgets import LineaAir
from ..field import fr
from ..field.constants import NUM_LIMBS, R_MOD, COSET_SHIFT
from ..ntt.ntt import _powers_device, root_of_unity
from ..prover.uni_stark import compute_quotient
from ..trace.builders import build_permutation_columns
from .mesh import ROWS_AXIS, make_mesh
from .sharded import sharded_fold, sharded_merkle_root, sharded_ntt


def sharded_coset_lde(x: jax.Array, mesh, added_bits: int, shift: int) -> jax.Array:
    """(16, C, n) evals on H_n -> (16, C, n·2^added_bits) on shift·H, both
    contiguously row-sharded."""
    n = x.shape[-1]
    coeffs = sharded_ntt(x, mesh, inverse=True)
    coeffs = fr.mul_const(coeffs, pow(n, R_MOD - 2, R_MOD))
    big_n = n << added_bits
    pad = jnp.zeros(coeffs.shape[:-1] + (big_n - n,), coeffs.dtype)
    padded = jnp.concatenate([coeffs, pad], axis=-1)
    padded = jax.lax.with_sharding_constraint(
        padded, NamedSharding(mesh, P(None, None, ROWS_AXIS))
    )
    scale = _powers_device(shift, big_n)
    padded = fr.mul(padded, scale[:, None, :])
    return sharded_ntt(padded, mesh)


def make_step(mesh, n: int, w: int, log_blowup: int, alpha_int: int,
              delta_int: int, gamma_int: int = 7):
    """Build the jitted sharded prove-core step for a w-column permutation
    trace of height n (a/b each w columns).  ``alpha_int``/``delta_int`` are
    the same challenge values that arrive as device scalars in ``step`` —
    the quotient path folds them in as compile-time powers, mirroring how the
    real prover receives sampled ints from the challenger."""
    shift = COSET_SHIFT
    n_lde = n << log_blowup
    log_lde = n_lde.bit_length() - 1
    omega_lde = root_of_unity(log_lde)

    def step(a, b, alpha, delta):
        # 1. device-resident trace columns (scans partition over the mesh)
        cols, cfg = build_permutation_columns(a, b, alpha, delta)
        air = LineaAir((cfg,))
        # 2. coset LDE of the whole trace
        lde = sharded_coset_lde(cols, mesh, log_blowup, shift)
        # 3. Merkle commitment root (subtree + all_gather)
        root = sharded_merkle_root(lde, mesh)
        # 4. quotient on its degree-determined cosets -> (16, C, n)
        q = compute_quotient(lde, air, alpha_int, delta_int, gamma_int, n, shift)
        # 5. two FRI folds with ppermute exchange (structural stand-in
        # codeword: the chunk evals flattened back to one row-sharded axis)
        f0 = jax.lax.with_sharding_constraint(
            q.reshape(NUM_LIMBS, -1),
            NamedSharding(mesh, P(None, ROWS_AXIS)),
        )
        f1 = sharded_fold(f0, 3, shift, omega_lde, mesh)
        f2 = sharded_fold(
            f1, 9, (shift * shift) % R_MOD, (omega_lde * omega_lde) % R_MOD, mesh
        )
        return root, f2

    return step


def dryrun(n_devices: int) -> None:
    """One tiny sharded step on an n_devices mesh; raises on any failure."""
    mesh = make_mesh(n_devices)
    d = n_devices
    # smallest height whose NTT factors both divide by d
    log_n = max(2 * (max(d, 2).bit_length() - 1), 6)
    n = 1 << log_n
    w = 2
    log_blowup = 2

    alpha_i, delta_i = 5, 11

    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 16, size=(16, w, n), dtype=np.uint32)
    vals[15] = 0
    a = jnp.asarray(vals)
    perm = rng.permutation(n)
    b = a[:, :, perm]

    sharding = NamedSharding(mesh, P(None, None, ROWS_AXIS))
    a = jax.device_put(a, sharding)
    b = jax.device_put(b, sharding)
    alpha = jax.device_put(jnp.asarray(fr.pack_ints([alpha_i]))[:, 0], NamedSharding(mesh, P(None)))
    delta = jax.device_put(jnp.asarray(fr.pack_ints([delta_i]))[:, 0], NamedSharding(mesh, P(None)))

    step = make_step(mesh, n, w, log_blowup, alpha_i, delta_i)
    jitted = jax.jit(step)
    root, folded = jitted(a, b, alpha, delta)
    jax.block_until_ready((root, folded))
    # two halvings of the flattened (C=2 chunks × n) quotient codeword
    assert folded.shape == (NUM_LIMBS, 2 * n // 4)
    assert root.shape == (NUM_LIMBS,)
