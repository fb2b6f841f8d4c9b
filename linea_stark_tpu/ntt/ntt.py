"""Radix-2 NTT and coset low-degree extension over Fr.

TPU-native replacement for the reference's ``Radix2DitParallel`` +
``coset_lde_batch`` (p3-dft; spans at bench.log:20,23-30; SURVEY.md §2b).

Design notes (idiomatic XLA, not a port):

* **Stockham self-sorting transform**: natural order in and out, no
  bit-reversal permutation at any point.  Each stage combines sub-sequence
  pairs (l, l + L/2) into contiguous double-length outputs:

      Y[l, 0:M] = X[l] + w·X[l+L/2]
      Y[l, M:2M] = X[l] − w·X[l+L/2],     w = ω_{2M}^j,  j < M

  Every stage is a static reshape / slice / concat over the trailing axes —
  XLA-friendly, and each stage's butterfly maps onto a Pallas kernel whose
  output block is contiguous in index space (kernels/pallas_ntt.py).

* Coefficients are natural order, so zero-padding for the blowup is a plain
  concat and coset scaling is a power table multiply.

* Twiddles: one master power table P[k] = w^k, k < N/2, built on device by
  log-doubling (~log N multiplies, safe inside jit); the stage-M twiddles are
  the strided slice P[::N/(2M)][:M].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import fr_ops as fo
from ..field import fr
from ..field.constants import NUM_LIMBS, R_MOD, TWO_ADICITY, TWO_ADIC_GENERATOR


def root_of_unity(log_n: int, inverse: bool = False) -> int:
    """Canonical primitive 2**log_n-th root of unity (Python int)."""
    assert log_n <= TWO_ADICITY
    w = pow(TWO_ADIC_GENERATOR, 1 << (TWO_ADICITY - log_n), R_MOD)
    if inverse:
        w = pow(w, R_MOD - 2, R_MOD)
    return w


def _powers_device(base_int: int, count: int) -> jax.Array:
    """Device table [1, w, w^2, ..., w^{count-1}] built by log-doubling."""
    return fo.powers(base_int, count)


def _twiddle_table(log_n: int, inverse: bool) -> jax.Array:
    """Master table P[k] = w^k for k < n/2 (built per call; jit-safe)."""
    n = 1 << log_n
    return _powers_device(root_of_unity(log_n, inverse), max(n // 2, 1))


def _stage_twiddles(table: jax.Array, n: int, two_m: int) -> jax.Array:
    """w_{2M}^j for j < M, as the strided slice P[::n/2M][:M]."""
    m = two_m // 2
    stride = n // two_m
    return table[..., ::stride][..., :m]


def ntt(x: jax.Array, inverse: bool = False, scale: bool = True) -> jax.Array:
    """Stockham NTT along the last axis: natural in / natural out.

    With ``inverse=True`` uses ω^{-1}; ``scale`` additionally multiplies by
    1/N (the actual inverse transform).
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return x
    from ..backend import use_pallas

    if use_pallas() and n >= 4096:
        from ..kernels.pallas_ntt import ntt_pallas

        out = ntt_pallas(x, inverse)
    else:
        out = _ntt_xla(x, log_n, inverse)
    if inverse and scale:
        out = fo.mul_const(out, pow(n, R_MOD - 2, R_MOD))
    return out


import functools


@functools.lru_cache(maxsize=32)
def _bitrev_np(n: int) -> "np.ndarray":
    bits = n.bit_length() - 1
    t = np.zeros(n, dtype=np.int32)
    for i in range(1, n):
        t[i] = (t[i >> 1] >> 1) | ((i & 1) << (bits - 1))
    return t


def _ntt_xla(x: jax.Array, log_n: int, inverse: bool) -> jax.Array:
    """Radix-2 DIF as ONE ``lax.scan`` over stages + a final bit-reversal
    gather (natural order in and out).

    Stage s combines partners i ↔ i⊕half (half = n >> (s+1)):
        lower:  v[i] + v[i⊕half]
        upper:  (v[i⊕half] − v[i]) · w^{(i & (half−1)) << s}
    Partner and twiddle positions are computed from the stage counter with
    bit arithmetic and fetched by gather, so every stage shares one compiled
    body containing a single field multiply — the XLA limb graphs compile in
    seconds instead of minutes (one multiply graph per unrolled stage).  The
    TPU hot path is the Pallas four-step kernel; this is the CPU/test and
    GSPMD-dryrun path.
    """
    if log_n == 0:
        return x
    n = 1 << log_n
    table = _twiddle_table(log_n, inverse)  # (16, n/2) master powers of w
    batch_ndim = x.ndim - 2
    i = jnp.arange(n, dtype=jnp.int32)
    stages = jnp.arange(log_n, dtype=jnp.int32)

    def body(v, s):
        half = jnp.int32(n) >> (s + 1)
        partner = i ^ half
        upper = (i & half) != 0
        tidx = (i & (half - 1)) << s
        vp = jnp.take(v, partner, axis=-1)
        tw = jnp.take(table, tidx, axis=-1)
        tw = tw.reshape((NUM_LIMBS,) + (1,) * batch_ndim + (n,))
        ssum = fr.add(v, vp)
        sdiff = fr.mul(fr.sub(vp, v), tw)
        return jnp.where(upper, sdiff, ssum), None

    v, _ = jax.lax.scan(body, x, stages)
    return jnp.take(v, jnp.asarray(_bitrev_np(n)), axis=-1)


def intt(x: jax.Array) -> jax.Array:
    """Inverse NTT, natural in / natural out."""
    return ntt(x, inverse=True, scale=True)


# ---------------------------------------------------------------------------
# Coefficient-domain helpers (natural order)
# ---------------------------------------------------------------------------

def _coset_scale(n: int, shift_int: int) -> jax.Array:
    """(16, n) vector of shift^d at position d."""
    return _powers_device(shift_int, n)


def evals_to_coeffs(evals: jax.Array, shift_int: int = 1) -> jax.Array:
    """Evaluations on shift·H (natural order) -> coefficients (natural).

    For a coset shift g, p(g·x) has coefficients c_d·g^d; dividing by g^d
    recovers p's own coefficients.
    """
    n = evals.shape[-1]
    coeffs = ntt(evals, inverse=True, scale=True)
    if shift_int != 1:
        inv_shift = pow(shift_int, R_MOD - 2, R_MOD)
        scale = _coset_scale(n, inv_shift)
        coeffs = fo.mul(
            coeffs, scale.reshape((NUM_LIMBS,) + (1,) * (evals.ndim - 2) + (n,))
        )
    return coeffs


def coeffs_to_evals(coeffs: jax.Array, shift_int: int = 1) -> jax.Array:
    """Coefficients (natural order) -> evaluations on shift·H (natural)."""
    n = coeffs.shape[-1]
    if shift_int != 1:
        scale = _coset_scale(n, shift_int)
        coeffs = fo.mul(
            coeffs, scale.reshape((NUM_LIMBS,) + (1,) * (coeffs.ndim - 2) + (n,))
        )
    return ntt(coeffs)


def pad_coeffs(coeffs: jax.Array, added_bits: int) -> jax.Array:
    """Zero-pad natural-order coefficients of size n to size n·2**added_bits."""
    if added_bits == 0:
        return coeffs
    n = coeffs.shape[-1]
    pad_shape = coeffs.shape[:-1] + (n * ((1 << added_bits) - 1),)
    return jnp.concatenate([coeffs, jnp.zeros(pad_shape, coeffs.dtype)], axis=-1)


def coset_lde(
    evals: jax.Array,
    added_bits: int,
    shift_int: int,
    src_shift_int: int = 1,
) -> jax.Array:
    """Low-degree extension: evaluations of degree-<n polys on src_shift·H_n
    (natural order) -> evaluations on shift·H_{n·2^added_bits} (natural).

    Equivalent of the reference's ``coset_lde_batch(matrix, added_bits)``
    (bin/src/config.rs:22, bench.log:20) with an explicit source coset so
    quotient chunks (which live on cosets of the LDE domain) reuse the same
    path.
    """
    coeffs = evals_to_coeffs(evals, src_shift_int)
    padded = pad_coeffs(coeffs, added_bits)
    return coeffs_to_evals(padded, shift_int)
