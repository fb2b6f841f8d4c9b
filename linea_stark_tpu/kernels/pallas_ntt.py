"""Pallas TPU kernels for the NTT (four-step Stockham).

Large transforms factor as N = N1·N2 (Bailey four-step):

    1. view (N1, N2) row-major; NTT size N1 along axis -2
    2. multiply twiddles T[k1, i2] = ω^{k1·i2}
    3. transpose to (N2, N1)   [the all-to-all under row sharding]
    4. NTT size N2 along axis -2; flatten — output lands in natural order

Every Stockham stage transforms **axis -2**, so the lane (last) axis stays
wide at every stage — tiles are (sublanes = butterfly positions, lanes = the
untransformed axis), never the degenerate (…, 1)-lane shapes a last-axis
radix-2 stage would produce.  Each stage is one pallas_call: block a reads
sub-sequence l, block b reads l + L/2 (same array, second index map), and the
(…, 2, M, lanes) output block is contiguous in index space, reshaping for
free into the next stage's view.

Small transforms (N < 4096) fall back to the XLA path — they are never hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fr
from ..field.constants import NUM_LIMBS, R_MOD
from .pallas_field import _interpret

_PALLAS_MIN_N = 4096


def _stage_axis2(v: jax.Array, w_stage: jax.Array, lanes_tile: int = 1024, m_tile: int = 8) -> jax.Array:
    """One Stockham stage over axis -2.  v: (16, C, L, M, S) -> (16, C, L/2, 2M, S)."""
    _, c, l_count, m, s = v.shape
    half = l_count // 2
    t2 = min(lanes_tile, s)
    tm = min(m_tile, m)
    grid = (c, half, m // tm, s // t2)

    a_spec = pl.BlockSpec(
        (NUM_LIMBS, 1, 1, tm, t2),
        lambda ci, l, jm, j2: (0, ci, l, jm, j2),
        memory_space=pltpu.VMEM,
    )
    b_spec = pl.BlockSpec(
        (NUM_LIMBS, 1, 1, tm, t2),
        lambda ci, l, jm, j2, half=half: (0, ci, l + half, jm, j2),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec(
        (NUM_LIMBS, tm), lambda ci, l, jm, j2: (0, jm), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (NUM_LIMBS, 1, 1, 2, tm, t2),
        lambda ci, l, jm, j2: (0, ci, l, 0, jm, j2),
        memory_space=pltpu.VMEM,
    )

    def kernel(a_ref, b_ref, w_ref, o_ref):
        la = [a_ref[i, 0, 0] for i in range(NUM_LIMBS)]          # (tm, t2)
        lb = [b_ref[i, 0, 0] for i in range(NUM_LIMBS)]
        lw = [w_ref[i].reshape(tm, 1) for i in range(NUM_LIMBS)]  # broadcast lanes
        wt = fr.mul_limb_lists(lb, lw)
        hi = fr.add_limb_lists(la, wt)
        lo = fr.sub_limb_lists(la, wt)
        for i in range(NUM_LIMBS):
            o_ref[i, 0, 0, 0] = hi[i]
            o_ref[i, 0, 0, 1] = lo[i]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, c, half, 2, m, s), v.dtype),
        grid=grid,
        in_specs=[a_spec, b_spec, w_spec],
        out_specs=o_spec,
        interpret=_interpret(),
    )(v, v, w_stage)
    return out.reshape(NUM_LIMBS, c, half, 2 * m, s)


def _transform_axis2(v: jax.Array, log_nt: int, table: jax.Array, n_table: int) -> jax.Array:
    """Full Stockham NTT of size 2^log_nt along axis -2 of (16, C, Nt, S).

    ``table`` is the master power table of a root whose order is ``n_table``
    (>= 2^log_nt); stage twiddles are strided slices.
    """
    from ..ntt.ntt import _stage_twiddles

    nt = 1 << log_nt
    _, c, nt_in, s = v.shape
    assert nt_in == nt
    v = v.reshape(NUM_LIMBS, c, nt, 1, s)
    stride0 = n_table // nt  # subgroup of order nt inside the table's group
    m = 1
    for _ in range(log_nt):
        # w_{2M} of the size-nt transform = ω_table^{n_table/(2M·1)·…}: the
        # strided slice at stride n_table/(2m·stride0), first m entries.
        w = _stage_twiddles(table, n_table, 2 * m * stride0)[..., :m]
        v = _stage_axis2(v, w)
        m *= 2
    return v.reshape(NUM_LIMBS, c, nt, s)


def _four_step_twiddles(log_n: int, inverse: bool, n1: int, n2: int) -> jax.Array:
    """T[k1, i2] = w^{k1·i2} as (16, N1, N2), built with log N1 doubling rows."""
    from ..ntt.ntt import _powers_device, root_of_unity

    from .. import fr_ops as fo

    w = root_of_unity(log_n, inverse)
    # Block doubling over k1: T[0:2K] = [T[0:K], T[0:K]·R_K] with
    # R_K[i2] = w^{K·i2} — log N1 vector multiplies total.
    cur = fr.ones((1, n2))
    size = 1
    while size < n1:
        r_k = _powers_device(pow(w, size, R_MOD), n2)  # w^{size·i2}
        scaled = fo.mul(cur, r_k[:, None, :])
        cur = jnp.concatenate([cur, scaled], axis=1)
        size *= 2
    return cur[:, :n1]


@functools.partial(jax.jit, static_argnames=("inverse",))
def ntt_pallas(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Four-step Stockham NTT over the last axis of (16, *batch, N)
    (natural order in/out, unscaled)."""
    from ..ntt.ntt import _ntt_xla, _twiddle_table

    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if log_n < 2:
        return _ntt_xla(x, log_n, inverse)

    batch = x.shape[1:-1]
    c = 1
    for sdim in batch:
        c *= sdim
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2

    table = _twiddle_table(log_n, inverse)  # master: root of order n

    v = x.reshape(NUM_LIMBS, c, n1, n2)
    v = _transform_axis2(v, log_n1, table, n)
    t = _four_step_twiddles(log_n, inverse, n1, n2)
    v = _mul_broadcast(v, t)
    v = jnp.swapaxes(v, -1, -2)  # (16, C, N2, N1)
    v = _transform_axis2(v, log_n2, table, n)
    return v.reshape(x.shape)


def _mul_broadcast(v: jax.Array, t: jax.Array, tile: int = 1024) -> jax.Array:
    """v (16, C, N1, N2) * t (16, N1, N2) elementwise, t shared across C."""
    _, c, n1, n2 = v.shape
    t2 = min(tile, n2)
    grid = (c, n1, n2 // t2)
    v_spec = pl.BlockSpec(
        (NUM_LIMBS, 1, 1, t2), lambda ci, i, j: (0, ci, i, j), memory_space=pltpu.VMEM
    )
    t_spec = pl.BlockSpec(
        (NUM_LIMBS, 1, t2), lambda ci, i, j: (0, i, j), memory_space=pltpu.VMEM
    )

    def kernel(a_ref, b_ref, o_ref):
        la = [a_ref[i, 0, 0] for i in range(NUM_LIMBS)]
        lb = [b_ref[i, 0] for i in range(NUM_LIMBS)]
        out = fr.mul_limb_lists(la, lb)
        for i in range(NUM_LIMBS):
            o_ref[i, 0, 0] = out[i]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=grid,
        in_specs=[v_spec, t_spec],
        out_specs=v_spec,
        interpret=_interpret(),
    )(v, t)
