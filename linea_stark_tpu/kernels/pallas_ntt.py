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


def _lane_fold(m: int, s: int) -> int:
    """Fold factor k: view (M, S) as (M·k, S/k) so early stages (m < 8)
    fill all 8 VPU sublanes instead of 1-4 (the twiddle only depends on the
    m index, so it is repeated k times; the row-major reshape round-trips
    for free).  Keeps the folded lane axis a multiple of 128."""
    k = 8 // m if m < 8 else 1
    while k > 1 and (s % k or (s // k) % 128):
        k //= 2
    return k


@functools.partial(jax.jit, static_argnames=("lanes_tile", "m_tile"))
def _stage_axis2(v: jax.Array, w_stage: jax.Array, lanes_tile: int = 1024, m_tile: int = 8) -> jax.Array:
    """One Stockham stage over axis -2.  v: (16, C, L, M, S) -> (16, C, L/2, 2M, S)."""
    _, c, l_count, m0, s0 = v.shape
    k = _lane_fold(m0, s0)
    if k > 1:
        v = v.reshape(NUM_LIMBS, c, l_count, m0 * k, s0 // k)
        w_stage = jnp.repeat(w_stage, k, axis=-1)
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
    # Twiddles ride transposed (m, 16) so the block's trailing dims are
    # (tm, 16) — TPU block shapes must tile (8, 128) or match the array.
    w_spec = pl.BlockSpec(
        (tm, NUM_LIMBS), lambda ci, l, jm, j2: (jm, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (NUM_LIMBS, 1, 1, 2, tm, t2),
        lambda ci, l, jm, j2: (0, ci, l, 0, jm, j2),
        memory_space=pltpu.VMEM,
    )

    def kernel(a_ref, b_ref, w_ref, o_ref):
        la = [a_ref[i, 0, 0] for i in range(NUM_LIMBS)]          # (tm, t2)
        lb = [b_ref[i, 0, 0] for i in range(NUM_LIMBS)]
        lw = [w_ref[:, i].reshape(tm, 1) for i in range(NUM_LIMBS)]  # bcast lanes
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
    )(v, v, jnp.swapaxes(w_stage, 0, 1))
    return out.reshape(NUM_LIMBS, c, half, 2 * m0, s0)


@functools.partial(jax.jit, static_argnames=("lanes_tile", "m_tile"))
def _stage4_axis2(
    v: jax.Array, w1: jax.Array, w2a: jax.Array, w2b: jax.Array,
    lanes_tile: int = 1024, m_tile: int = 8,
) -> jax.Array:
    """Two merged Stockham stages (radix-4) over axis -2:
    (16, C, L, M, S) -> (16, C, L/4, 4M, S).

    Reads the four paired sub-rows, runs both butterfly levels in registers
    (one multiply per output point, but half the HBM passes and half the
    kernels of two radix-2 sweeps):

        p0 = a0 + w1·b0   q0 = a0 − w1·b0      (a0,b0) = rows l, l+L/2
        p1 = a1 + w1·b1   q1 = a1 − w1·b1      (a1,b1) = rows l+L/4, l+3L/4
        out[    j] = p0 + w2a·p1     out[2M+j] = p0 − w2a·p1
        out[ M+j] = q0 + w2b·q1     out[3M+j] = q0 − w2b·q1
    """
    _, c, l_count, m0, s0 = v.shape
    k = _lane_fold(m0, s0)
    if k > 1:
        v = v.reshape(NUM_LIMBS, c, l_count, m0 * k, s0 // k)
        w1 = jnp.repeat(w1, k, axis=-1)
        w2a = jnp.repeat(w2a, k, axis=-1)
        w2b = jnp.repeat(w2b, k, axis=-1)
    _, c, l_count, m, s = v.shape
    quarter = l_count // 4
    t2 = min(lanes_tile, s)
    tm = min(m_tile, m)
    grid = (c, quarter, m // tm, s // t2)

    def row_spec(offset):
        return pl.BlockSpec(
            (NUM_LIMBS, 1, 1, tm, t2),
            lambda ci, l, jm, j2, o=offset: (0, ci, l + o, jm, j2),
            memory_space=pltpu.VMEM,
        )

    w_spec = pl.BlockSpec(
        (tm, NUM_LIMBS), lambda ci, l, jm, j2: (jm, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (NUM_LIMBS, 1, 1, 4, tm, t2),
        lambda ci, l, jm, j2: (0, ci, l, 0, jm, j2),
        memory_space=pltpu.VMEM,
    )

    def kernel(a0_ref, a1_ref, b0_ref, b1_ref, w1_ref, w2a_ref, w2b_ref, o_ref):
        def rd(ref):
            return [ref[i, 0, 0] for i in range(NUM_LIMBS)]

        def tw(ref):
            return [ref[:, i].reshape(tm, 1) for i in range(NUM_LIMBS)]

        a0, a1, b0, b1 = rd(a0_ref), rd(a1_ref), rd(b0_ref), rd(b1_ref)
        lw1, lw2a, lw2b = tw(w1_ref), tw(w2a_ref), tw(w2b_ref)
        t0 = fr.mul_limb_lists(b0, lw1)
        t1 = fr.mul_limb_lists(b1, lw1)
        p0 = fr.add_limb_lists(a0, t0)
        q0 = fr.sub_limb_lists(a0, t0)
        p1 = fr.add_limb_lists(a1, t1)
        q1 = fr.sub_limb_lists(a1, t1)
        u = fr.mul_limb_lists(p1, lw2a)
        w = fr.mul_limb_lists(q1, lw2b)
        o0 = fr.add_limb_lists(p0, u)
        o2 = fr.sub_limb_lists(p0, u)
        o1 = fr.add_limb_lists(q0, w)
        o3 = fr.sub_limb_lists(q0, w)
        for i in range(NUM_LIMBS):
            o_ref[i, 0, 0, 0] = o0[i]
            o_ref[i, 0, 0, 1] = o1[i]
            o_ref[i, 0, 0, 2] = o2[i]
            o_ref[i, 0, 0, 3] = o3[i]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, c, quarter, 4, m, s), v.dtype),
        grid=grid,
        in_specs=[
            row_spec(0),
            row_spec(quarter),
            row_spec(2 * quarter),
            row_spec(3 * quarter),
            w_spec,
            w_spec,
            w_spec,
        ],
        out_specs=o_spec,
        interpret=_interpret(),
    )(
        v, v, v, v,
        jnp.swapaxes(w1, 0, 1),
        jnp.swapaxes(w2a, 0, 1),
        jnp.swapaxes(w2b, 0, 1),
    )
    return out.reshape(NUM_LIMBS, c, quarter, 4 * m0, s0)


# Read once at import: a per-call read would freeze into jit caches anyway
# (making the toggle silently inert under a caller's jit) and the
# radix-2/4 trade-off deserves one visible constant.  Default radix-4 on
# the TPU path (round-5: half the HBM passes and kernel launches of
# radix-2 — the 2^22-blowup-4 config quadruples LDE work relative to
# hashing, BENCH_MATRIX row 6); per-stage Mosaic compiles are ~2x radix-2
# but ride the persistent cache.  Set LINEA_NTT_RADIX=2 before import to
# revert.
import os as _os

_RADIX4 = _os.environ.get("LINEA_NTT_RADIX", "4") == "4"


def _radix4() -> bool:
    return _RADIX4


def _transform_axis2(v: jax.Array, log_nt: int, table: jax.Array, n_table: int) -> jax.Array:
    """Full Stockham NTT of size 2^log_nt along axis -2 of (16, C, Nt, S).

    ``table`` is the master power table of a root whose order is ``n_table``
    (>= 2^log_nt); stage twiddles are strided slices.  Default is radix-2
    stages: each stage kernel's body holds ONE field multiply, compiling in
    ~2-3s vs ~10s for the 4-multiply radix-4 body — and every stage shape is
    a distinct Mosaic program, so a cold prove's NTT compile bill scales
    with (stages × per-stage cost).  Radix-4 (half the HBM passes, ~2x
    transform speed, ~2x compile) via LINEA_NTT_RADIX=4.
    """
    from ..ntt.ntt import _stage_twiddles

    nt = 1 << log_nt
    _, c, nt_in, s = v.shape
    assert nt_in == nt
    v = v.reshape(NUM_LIMBS, c, nt, 1, s)
    m = 1
    remaining = log_nt
    radix4 = _radix4()
    if remaining % 2 or not radix4:
        # The size-nt transform's root is ω_table^{n_table/nt}, so its stage
        # twiddle w_{2M}^j = ω_table^{(n_table/(2M))·j} — the table stride is
        # n_table/(2M) for *any* sub-transform size.
        steps = remaining if not radix4 else 1
        for _ in range(steps):
            w = _stage_twiddles(table, n_table, 2 * m)
            v = _stage_axis2(v, w)
            m *= 2
            remaining -= 1
    while remaining > 0:
        w1 = _stage_twiddles(table, n_table, 2 * m)
        w2 = _stage_twiddles(table, n_table, 4 * m)  # (2m,)
        v = _stage4_axis2(v, w1, w2[..., :m], w2[..., m : 2 * m])
        m *= 4
        remaining -= 2
    return v.reshape(NUM_LIMBS, c, nt, s)


_TWIDDLE_CACHE: dict = {}
_TWIDDLE_CACHE_MAX = 4


def _four_step_twiddles(log_n: int, inverse: bool, n1: int, n2: int) -> jax.Array:
    """T[k1, i2] = w^{k1·i2} as (16, N1, N2), built with log N1 doubling rows.

    Cached by transform signature — rebuilt tables cost ~log N1 full-size
    multiplies per NTT call, pure dispatch latency on a remote TPU."""
    from ..ntt.ntt import _powers_device, root_of_unity

    from .. import fr_ops as fo

    key = (log_n, inverse, n1, n2)
    if not fo._tracing():
        cached = _TWIDDLE_CACHE.get(key)
        if cached is not None:
            return cached

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
    cur = cur[:, :n1]
    if not fo._tracing():
        while len(_TWIDDLE_CACHE) >= _TWIDDLE_CACHE_MAX:
            _TWIDDLE_CACHE.pop(next(iter(_TWIDDLE_CACHE)))
        _TWIDDLE_CACHE[key] = cur
    return cur


# Canonical batch count: smaller batches zero-pad up to this so all four-step
# stage programs of a given N are shared across callers (the quotient-chunk
# transforms at C=2 otherwise re-compile every stage shape — ~100s of Mosaic
# time to save ~100ms of padded-transform work).
_CANON_BATCH = 8


def ntt_pallas(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Four-step Stockham NTT over the last axis of (16, *batch, N)
    (natural order in/out, unscaled).

    Deliberately not wrapped in one big jit: each stage kernel compiles (and
    caches) independently, so first-run compilation is incremental and
    partial results are shared across transform sizes."""
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
    if 1 < c < _CANON_BATCH and c * n <= 1 << 24:
        # share one program set across small callers — but never at huge
        # transforms, where padding the batch axis costs gigabytes of HBM
        # for compile-cache sharing that no longer matters (the 2^24-point
        # streamed-group derive OOMed on exactly this)
        c_pad = _CANON_BATCH
    elif c > _CANON_BATCH and c & (c - 1):
        # round odd larger batches up to the next power of two so variable
        # batch counts collapse onto a few program sets (round-3 advisor)
        c_pad = 1 << c.bit_length()
    else:
        c_pad = c
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2

    table = _twiddle_table(log_n, inverse)  # master: root of order n

    v = x.reshape(NUM_LIMBS, c, n1, n2)
    if c_pad != c:
        v = jnp.concatenate(
            [v, jnp.zeros((NUM_LIMBS, c_pad - c, n1, n2), v.dtype)], axis=1
        )
    v = _transform_axis2(v, log_n1, table, n)
    t = _four_step_twiddles(log_n, inverse, n1, n2)
    v = _mul_broadcast(v, t)
    v = jnp.swapaxes(v, -1, -2)  # (16, C, N2, N1)
    v = _transform_axis2(v, log_n2, table, n)
    if c_pad != c:
        v = v[:, :c]
    return v.reshape(x.shape)


@functools.partial(jax.jit, static_argnames=("tile",))
def _mul_broadcast(v: jax.Array, t: jax.Array, tile: int = 1024) -> jax.Array:
    """v (16, C, N1, N2) * t (16, N1, N2) elementwise, t shared across C."""
    _, c, n1, n2 = v.shape
    t2 = min(tile, n2)
    tm = min(8, n1)
    grid = (c, n1 // tm, n2 // t2)
    v_spec = pl.BlockSpec(
        (NUM_LIMBS, 1, tm, t2), lambda ci, i, j: (0, ci, i, j), memory_space=pltpu.VMEM
    )
    t_spec = pl.BlockSpec(
        (NUM_LIMBS, tm, t2), lambda ci, i, j: (0, i, j), memory_space=pltpu.VMEM
    )

    def kernel(a_ref, b_ref, o_ref):
        la = [a_ref[i, 0] for i in range(NUM_LIMBS)]
        lb = [b_ref[i] for i in range(NUM_LIMBS)]
        out = fr.mul_limb_lists(la, lb)
        for i in range(NUM_LIMBS):
            o_ref[i, 0] = out[i]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=grid,
        in_specs=[v_spec, t_spec],
        out_specs=v_spec,
        interpret=_interpret(),
    )(v, t)
