"""FRI folding: device halving step + scalar verifier counterpart.

Arity-2 fold of evaluations on a multiplicative coset s·H (natural order):
with f(x) = f_e(x²) + x·f_o(x²),

    f'(x²) = f_e(x²) + β·f_o(x²)
           = (f(x) + f(−x))/2 + β·(f(x) − f(−x))/(2x).

In natural order −x_i = x_{i+N/2}, so the fold pairs the first and second
halves of the array — a contiguous slice, no gather — and the folded codeword
lives on s²·H² (again natural order).  Under row-sharding the second half
lives on the opposite half of the mesh: one ``ppermute`` exchange per fold
(SURVEY.md §5.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import fr_ops as fo
from ..field import fr, oracle
from ..field.constants import NUM_LIMBS, R_MOD


@functools.lru_cache(maxsize=64)
def _inv2x_table(shift_int: int, omega_int: int, half: int):
    """Device table 1/(2·shift·omega^i), i < half (numpy-backed so the cache
    never leaks tracers)."""
    import numpy as np

    inv2 = pow(2, R_MOD - 2, R_MOD)
    inv_shift = pow(shift_int, R_MOD - 2, R_MOD)
    inv_omega = pow(omega_int, R_MOD - 2, R_MOD)
    c = (inv2 * inv_shift) % R_MOD
    vals = np.empty(half, dtype=object)
    acc = c
    for i in range(half):
        vals[i] = acc
        acc = acc * inv_omega % R_MOD
    return jnp.asarray(fr.pack_ints(list(vals)))


@functools.partial(jax.jit, donate_argnums=(0,))
def _fold_jit(f: jax.Array, beta: jax.Array, inv2x: jax.Array) -> jax.Array:
    n = f.shape[-1]
    half = n // 2
    a = f[..., :half]
    b = f[..., half:]
    inv2 = pow(2, R_MOD - 2, R_MOD)
    s = fo.mul_const(fo.add(a, b), inv2)
    d = fo.mul(fo.sub(a, b), inv2x)
    return fo.add(s, fo.mul(d, beta[:, None]))


def fold_codeword(f: jax.Array, beta_int: int, shift_int: int, omega_int: int) -> jax.Array:
    """One fold of (16, N) evals on shift·<omega> -> (16, N/2) on shift²·<omega²>.

    One jitted dispatch per fold: the 1/(2x) table is host-cached per level
    shape (the FRI ladder reuses the same (shift, omega, size) triples every
    prove) and β rides in as a (16,) device scalar so no per-β retrace."""
    n = f.shape[-1]
    inv2x = _inv2x_table(shift_int, omega_int, n // 2)
    beta = jnp.asarray(fr.pack_ints([beta_int]))[:, 0]
    return _fold_jit(f, beta, inv2x)


def fold_pair_int(lo: int, hi: int, x_lo: int, beta: int) -> int:
    """Scalar fold for the verifier's per-query walk."""
    inv2 = pow(2, R_MOD - 2, R_MOD)
    s = oracle.mul(oracle.add(lo, hi), inv2)
    d = oracle.mul(oracle.sub(lo, hi), oracle.inv((2 * x_lo) % R_MOD))
    return oracle.add(s, oracle.mul(beta, d))
