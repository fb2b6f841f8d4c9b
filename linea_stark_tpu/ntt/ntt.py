"""Radix-2 NTT and coset low-degree extension over Fr.

TPU-native replacement for the reference's ``Radix2DitParallel`` +
``coset_lde_batch`` (p3-dft; spans at bench.log:20,23-30; SURVEY.md §2b).

Design notes (idiomatic XLA, not a port):

* Transforms come in two flavors chosen so the LDE pipeline never performs an
  explicit bit-reversal permutation:
    - ``ntt_dif``:  natural-order input  -> bit-reversed output (Gentleman–Sande)
    - ``ntt_dit``:  bit-reversed input   -> natural-order output (Cooley–Tukey)
  ``coset_lde`` = iNTT(DIF, natural evals -> bitrev coeffs) ∘ coset-scale
  (scale vector pre-permuted into bitrev order on the host) ∘ zero-interleave
  (for degrees < n, rev_{n·2^k}(d) = rev_n(d) << k, so padding in bitrev
  coefficient order is a reshape + stack with zeros — no scatter) ∘ NTT(DIT).

* Every butterfly stage is a static reshape / slice / concat over the last
  axis, so XLA sees static shapes and fuses the limb arithmetic of
  :mod:`..field.fr` into each stage.

* Twiddles: one master power table  P[k] = w^k, k < N/2  per (log_n,
  direction), built on device by log-doubling and cached; stage-m twiddles are
  the strided slice P[::N/m][:m/2].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, oracle
from ..field.constants import NUM_LIMBS, R_MOD, TWO_ADICITY, TWO_ADIC_GENERATOR


def root_of_unity(log_n: int, inverse: bool = False) -> int:
    """Canonical primitive 2**log_n-th root of unity (Python int)."""
    assert log_n <= TWO_ADICITY
    w = pow(TWO_ADIC_GENERATOR, 1 << (TWO_ADICITY - log_n), R_MOD)
    if inverse:
        w = pow(w, R_MOD - 2, R_MOD)
    return w


def bit_reverse_indices(n: int) -> np.ndarray:
    """Host-side bit-reversal permutation indices for size n."""
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for _ in range(log_n):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev


def _powers_device(base_int: int, count: int) -> jax.Array:
    """Device table [1, w, w^2, ..., w^{count-1}] built by log-doubling."""
    p = fr.ones((1,))
    w_pow = base_int
    while p.shape[-1] < count:
        scaled = fr.mul_const(p, w_pow)
        p = jnp.concatenate([p, scaled], axis=-1)
        w_pow = (w_pow * w_pow) % R_MOD
    return p[..., :count]


def _twiddle_table(log_n: int, inverse: bool) -> jax.Array:
    """Master table P[k] = w^k for k < n/2, w the 2**log_n-th root.

    Built with ~log n multiplies; safe to call inside jit (the table becomes
    part of the traced computation, never a baked-in constant).
    """
    n = 1 << log_n
    return _powers_device(root_of_unity(log_n, inverse), max(n // 2, 1))


def _stage_twiddles(table: jax.Array, n: int, m: int) -> jax.Array:
    """Twiddles w_m^j, j < m/2 — strided slice of the master table."""
    stride = n // m
    t = table[..., :: stride]
    return t[..., : m // 2]


def _reshape_last(x: jax.Array, blocks: int, m: int) -> jax.Array:
    return x.reshape(x.shape[:-1] + (blocks, m))


def ntt_dit(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Cooley–Tukey DIT: bit-reversed input -> natural-order output."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return x
    table = _twiddle_table(log_n, inverse)
    for s in range(1, log_n + 1):
        m = 1 << s
        w = _stage_twiddles(table, n, m)  # (16, m//2)
        w = w.reshape((NUM_LIMBS,) + (1,) * (x.ndim - 1) + (m // 2,))
        v = _reshape_last(x, n // m, m)
        a = v[..., : m // 2]
        b = v[..., m // 2 :]
        t = fr.mul(b, w)
        x = jnp.concatenate([fr.add(a, t), fr.sub(a, t)], axis=-1).reshape(
            x.shape[:-1] + (n,)
        )
    return x


def ntt_dif(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Gentleman–Sande DIF: natural-order input -> bit-reversed output."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return x
    table = _twiddle_table(log_n, inverse)
    for s in range(log_n, 0, -1):
        m = 1 << s
        w = _stage_twiddles(table, n, m)
        w = w.reshape((NUM_LIMBS,) + (1,) * (x.ndim - 1) + (m // 2,))
        v = _reshape_last(x, n // m, m)
        a = v[..., : m // 2]
        b = v[..., m // 2 :]
        x = jnp.concatenate(
            [fr.add(a, b), fr.mul(fr.sub(a, b), w)], axis=-1
        ).reshape(x.shape[:-1] + (n,))
    return x


def bit_reverse(x: jax.Array) -> jax.Array:
    """Apply the bit-reversal permutation along the last axis (gather)."""
    rev = jnp.asarray(bit_reverse_indices(x.shape[-1]))
    return jnp.take(x, rev, axis=-1)


# ---------------------------------------------------------------------------
# Natural-order convenience wrappers
# ---------------------------------------------------------------------------

def ntt(x: jax.Array) -> jax.Array:
    """Forward NTT, natural in / natural out (explicit bit-reversal)."""
    return ntt_dit(bit_reverse(x))


def intt(x: jax.Array) -> jax.Array:
    """Inverse NTT, natural in / natural out."""
    n = x.shape[-1]
    out = ntt_dit(bit_reverse(x), inverse=True)
    return fr.mul_const(out, pow(n, R_MOD - 2, R_MOD))


# ---------------------------------------------------------------------------
# Coefficient-domain helpers in bit-reversed order
# ---------------------------------------------------------------------------

def evals_to_coeffs_bitrev(evals: jax.Array, shift_int: int = 1) -> jax.Array:
    """Evaluations on shift·H (natural order) -> coefficients (bitrev order).

    For a coset shift g, p(g·x) has coefficients c_d·g^d; dividing by g^d
    recovers p's own coefficients.
    """
    n = evals.shape[-1]
    coeffs = ntt_dif(evals, inverse=True)
    coeffs = fr.mul_const(coeffs, pow(n, R_MOD - 2, R_MOD))
    if shift_int != 1:
        inv_shift = pow(shift_int, R_MOD - 2, R_MOD)
        scale = _coset_scale_bitrev(n, inv_shift)
        coeffs = fr.mul(coeffs, scale.reshape((NUM_LIMBS,) + (1,) * (evals.ndim - 2) + (n,)))
    return coeffs


def coeffs_bitrev_to_evals(coeffs: jax.Array, shift_int: int = 1) -> jax.Array:
    """Coefficients (bitrev order) -> evaluations on shift·H (natural order)."""
    n = coeffs.shape[-1]
    if shift_int != 1:
        scale = _coset_scale_bitrev(n, shift_int)
        coeffs = fr.mul(coeffs, scale.reshape((NUM_LIMBS,) + (1,) * (coeffs.ndim - 2) + (n,)))
    return ntt_dit(coeffs)


def _coset_scale_bitrev(n: int, shift_int: int) -> jax.Array:
    """Device vector with shift^d at bit-reversed position rev(d)."""
    p = _powers_device(shift_int, n)
    rev = jnp.asarray(bit_reverse_indices(n))
    return jnp.take(p, rev, axis=-1)


def pad_coeffs_bitrev(coeffs: jax.Array, added_bits: int) -> jax.Array:
    """Zero-pad bitrev-ordered coefficients of size n to size n·2**added_bits.

    Because rev_{2^{k+a}}(d) = rev_{2^k}(d) << a for d < 2^k, padding in
    bitrev order interleaves each coefficient with 2**added_bits - 1 zeros.
    """
    if added_bits == 0:
        return coeffs
    n = coeffs.shape[-1]
    blowup = 1 << added_bits
    parts = [coeffs] + [jnp.zeros_like(coeffs)] * (blowup - 1)
    out = jnp.stack(parts, axis=-1)  # (..., n, blowup)
    return out.reshape(coeffs.shape[:-1] + (n * blowup,))


def coset_lde(
    evals: jax.Array,
    added_bits: int,
    shift_int: int,
    src_shift_int: int = 1,
) -> jax.Array:
    """Low-degree extension: evaluations of degree-<n polys on src_shift·H_n
    (natural order) -> evaluations on shift·H_{n·2^added_bits} (natural order).

    Equivalent of the reference's ``coset_lde_batch(matrix, added_bits)``
    (bin/src/config.rs:22, bench.log:20) with an explicit source coset so
    quotient chunks (which live on cosets of the LDE domain) reuse the same
    path.
    """
    coeffs = evals_to_coeffs_bitrev(evals, src_shift_int)
    padded = pad_coeffs_bitrev(coeffs, added_bits)
    return coeffs_bitrev_to_evals(padded, shift_int)
