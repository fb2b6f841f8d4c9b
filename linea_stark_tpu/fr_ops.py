"""Backend-dispatching field ops for prover-level code.

On TPU, XLA compiles the wide uint32 limb graphs pathologically slowly and
executes them memory-bound, so every O(N) field operation in the prover goes
through here: Pallas kernels on TPU, the plain-XLA implementations on CPU.
Layout ops (concat / slice / reshape / roll) stay plain jnp — they carry no
limb arithmetic.

Also hosts the prefix/suffix product scans (Hillis-Steele over log N full
width multiplies) used by batch inversion and the permutation check column:
``associative_scan`` would compile its combine body per odd internal shape,
whereas these steps are always full-width kernel sweeps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .backend import use_pallas
from .field import fr, oracle
from .field.constants import NUM_LIMBS, R_MOD, to_limbs


def mul(a, b):
    if use_pallas():
        from .kernels import pallas_field as pf

        if a.shape == b.shape:
            return pf.mul(a, b)
        # broadcast: expand the smaller operand
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a2 = jnp.broadcast_to(a, (NUM_LIMBS, *shape))
        b2 = jnp.broadcast_to(b, (NUM_LIMBS, *shape))
        return pf.mul(a2, b2)
    return fr.mul(a, b)


def add(a, b):
    if use_pallas():
        from .kernels import pallas_field as pf

        if a.shape == b.shape:
            return pf.add(a, b)
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        return pf.add(
            jnp.broadcast_to(a, (NUM_LIMBS, *shape)),
            jnp.broadcast_to(b, (NUM_LIMBS, *shape)),
        )
    return fr.add(a, b)


def sub(a, b):
    if use_pallas():
        from .kernels import pallas_field as pf

        if a.shape == b.shape:
            return pf.sub(a, b)
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        return pf.sub(
            jnp.broadcast_to(a, (NUM_LIMBS, *shape)),
            jnp.broadcast_to(b, (NUM_LIMBS, *shape)),
        )
    return fr.sub(a, b)


def mul_const(a, c_int: int):
    """Multiply by a host-known constant (converted once to Montgomery)."""
    if c_int % R_MOD == 1:
        return a
    if use_pallas():
        from .kernels import pallas_field as pf

        c = jnp.asarray(to_limbs(oracle.to_mont(c_int % R_MOD)))
        return pf.mul_scalar(a, c)
    return fr.mul_const(a, c_int)


def powers(base_int: int, count: int) -> jax.Array:
    """(16, count) table [1, w, ..., w^{count-1}] by block doubling."""
    p = fr.ones((1,))
    w_pow = base_int % R_MOD
    while p.shape[-1] < count:
        p = jnp.concatenate([p, mul_const(p, w_pow)], axis=-1)
        w_pow = (w_pow * w_pow) % R_MOD
    return p[..., :count]


def _shift_fill(x: jax.Array, k: int, fill: jax.Array, reverse: bool) -> jax.Array:
    """Shift along the last axis by k, filling vacated slots with `fill`."""
    n = x.shape[-1]
    pad = jnp.broadcast_to(fill, x.shape[:-1] + (k,))
    if reverse:
        return jnp.concatenate([x[..., k:], pad], axis=-1)
    return jnp.concatenate([pad, x[..., : n - k]], axis=-1)


def prefix_product(x: jax.Array, reverse: bool = False) -> jax.Array:
    """Inclusive prefix (or suffix) product along the last axis.

    Hillis-Steele: log2(N) full-width multiplies — every step is one Pallas
    sweep of a fixed shape, instead of associative_scan's shape zoo.
    """
    n = x.shape[-1]
    one = fr.ones(()).reshape((NUM_LIMBS,) + (1,) * (x.ndim - 1))
    k = 1
    while k < n:
        x = mul(x, _shift_fill(x, k, one, reverse))
        k *= 2
    return x


def prefix_sum(x: jax.Array, reverse: bool = False) -> jax.Array:
    """Inclusive prefix (or suffix) sum along the last axis."""
    n = x.shape[-1]
    zero = fr.zeros(()).reshape((NUM_LIMBS,) + (1,) * (x.ndim - 1))
    k = 1
    while k < n:
        x = add(x, _shift_fill(x, k, zero, reverse))
        k *= 2
    return x


def to_mont(x: jax.Array) -> jax.Array:
    """Canonical limbs -> Montgomery form (multiply by raw R², one kernel)."""
    from .field.constants import MONT_R2

    if use_pallas():
        from .kernels import pallas_field as pf

        return pf.mul_scalar(x, jnp.asarray(to_limbs(MONT_R2)))
    return fr.to_mont(x)


def batch_inverse(x: jax.Array) -> jax.Array:
    """Invert every element along the last axis (all must be nonzero).

    prefix·suffix exclusive products plus one host-side Fermat inversion of
    the total (a single scalar round-trip — the transcript already syncs
    host and device between phases).  Inside a jit trace (no host access)
    falls back to the scan-based implementation."""
    if isinstance(x, jax.core.Tracer):
        return fr.batch_inverse(x, axis=-1)
    n = x.shape[-1]
    pre = prefix_product(x)
    suf = prefix_product(x, reverse=True)
    one = fr.ones(()).reshape((NUM_LIMBS,) + (1,) * (x.ndim - 1))
    pre_exc = _shift_fill(pre, 1, one, reverse=False)
    suf_exc = _shift_fill(suf, 1, one, reverse=True)

    total = pre[..., -1:]
    flat = total.reshape(NUM_LIMBS, -1)
    vals = fr.unpack_ints(np.asarray(flat))
    inv_vals = [oracle.inv(v) for v in vals]
    total_inv = jnp.asarray(fr.pack_ints(inv_vals)).reshape(total.shape)

    return mul(mul(pre_exc, suf_exc), total_inv)


def tree_sum(x: jax.Array) -> jax.Array:
    """Field sum along the last axis by halving adds."""
    while x.shape[-1] > 1:
        n = x.shape[-1]
        half = n // 2
        s = add(x[..., :half], x[..., half : 2 * half])
        if n % 2:
            s = add(s[..., :1], x[..., n - 1 :]) if half == 0 else jnp.concatenate(
                [add(s[..., :1], x[..., n - 1 :]), s[..., 1:]], axis=-1
            )
        x = s
    return x[..., 0]
