"""Pallas TPU kernels for Fr limb arithmetic.

The XLA elementwise path materializes limb intermediates in HBM (measured
~42M muls/s on v5e — memory-bound ~40× below multiply speed-of-light), so the
hot ops run as Pallas kernels instead: the whole CIOS multiply executes on a
VMEM-resident block with every intermediate in registers, and HBM traffic is
just the operands and result (SURVEY.md §7 hard part #1).

Layout: field batches are (16, N) uint32.  Each grid step processes a
(16, TILE) block; per-limb values are (TILE,)-shaped lane vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fr
from ..field.constants import NUM_LIMBS

U32 = jnp.uint32
DEFAULT_TILE = 2048


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    return not _on_tpu()


def _mul_kernel(a_ref, b_ref, o_ref):
    la = [a_ref[i] for i in range(NUM_LIMBS)]
    lb = [b_ref[i] for i in range(NUM_LIMBS)]
    out = fr.mul_limb_lists(la, lb)
    for i in range(NUM_LIMBS):
        o_ref[i] = out[i]


def _flatten(a: jax.Array):
    """(16, *batch) -> (16, N) plus the original shape."""
    return a.reshape(NUM_LIMBS, -1), a.shape


def _binop(kernel, a: jax.Array, b: jax.Array, tile: int) -> jax.Array:
    af, shape = _flatten(a)
    bf, _ = _flatten(b)
    n = af.shape[-1]
    assert af.shape == bf.shape
    t = min(tile, n)
    while n % t:
        t //= 2
    spec = pl.BlockSpec((NUM_LIMBS, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n), af.dtype),
        grid=(n // t,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(af, bf)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("tile",))
def mul(a: jax.Array, b: jax.Array, tile: int = DEFAULT_TILE) -> jax.Array:
    """Batched Montgomery multiply on (16, *batch) limb arrays."""
    return _binop(_mul_kernel, a, b, tile)


def _add_kernel(a_ref, b_ref, o_ref):
    out = fr.add_limb_lists(
        [a_ref[i] for i in range(NUM_LIMBS)], [b_ref[i] for i in range(NUM_LIMBS)]
    )
    for i in range(NUM_LIMBS):
        o_ref[i] = out[i]


def _sub_kernel(a_ref, b_ref, o_ref):
    out = fr.sub_limb_lists(
        [a_ref[i] for i in range(NUM_LIMBS)], [b_ref[i] for i in range(NUM_LIMBS)]
    )
    for i in range(NUM_LIMBS):
        o_ref[i] = out[i]


@functools.partial(jax.jit, static_argnames=("tile",))
def add(a: jax.Array, b: jax.Array, tile: int = DEFAULT_TILE) -> jax.Array:
    return _binop(_add_kernel, a, b, tile)


@functools.partial(jax.jit, static_argnames=("tile",))
def sub(a: jax.Array, b: jax.Array, tile: int = DEFAULT_TILE) -> jax.Array:
    return _binop(_sub_kernel, a, b, tile)


def _sum128_kernel(x_ref, o_ref):
    """Reduce a (16, T) block to (16, 128) partial sums, accumulating across
    the inner grid dimension (sequential on TPU)."""
    j = pl.program_id(1)
    t = x_ref.shape[-1]
    rows = t // 128
    v = [x_ref[i].reshape(rows, 128) for i in range(NUM_LIMBS)]
    while rows > 1:
        half = rows // 2
        top = [x[:half] for x in v]
        bot = [x[half:] for x in v]
        v = fr.add_limb_lists(top, bot)
        rows = half
    partial = [x.reshape(128) for x in v]

    @pl.when(j == 0)
    def _():
        for i in range(NUM_LIMBS):
            o_ref[i] = partial[i]

    @pl.when(j != 0)
    def _():
        acc = fr.add_limb_lists([o_ref[i] for i in range(NUM_LIMBS)], partial)
        for i in range(NUM_LIMBS):
            o_ref[i] = acc[i]


@functools.partial(jax.jit, static_argnames=("tile",))
def block_sums_128(x: jax.Array, tile: int = 8192) -> jax.Array:
    """(16, W, N) -> (16, W, 128) per-column partial field sums (N >= 128).

    Runs on the flattened (16, W·N) view so blocks are plain (16, T) tiles;
    the grid's outer dim walks columns, the inner dim accumulates into that
    column's (16, 128) output tile."""
    _, w, n = x.shape
    t = min(tile, n)
    while n % t:
        t //= 2
    assert t >= 128 and t % 128 == 0
    flat = x.reshape(NUM_LIMBS, w * n)
    blocks_per_col = n // t
    out = pl.pallas_call(
        _sum128_kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, w * 128), x.dtype),
        grid=(w, blocks_per_col),
        in_specs=[
            pl.BlockSpec(
                (NUM_LIMBS, t),
                lambda wi, j, b=blocks_per_col: (0, wi * b + j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (NUM_LIMBS, 128), lambda wi, j: (0, wi), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(flat)
    return out.reshape(NUM_LIMBS, w, 128)


def _wsum128_kernel(x_ref, u_ref, o_ref):
    """Fused multiply + reduce: (16, T) block of one column times the shared
    (16, T) weight block, folded to (16, 128) partial sums, accumulating
    across the inner grid dimension."""
    j = pl.program_id(1)
    t = x_ref.shape[-1]
    rows = t // 128
    prod = fr.mul_limb_lists(
        [x_ref[i] for i in range(NUM_LIMBS)], [u_ref[i] for i in range(NUM_LIMBS)]
    )
    v = [p.reshape(rows, 128) for p in prod]
    while rows > 1:
        half = rows // 2
        v = fr.add_limb_lists([x[:half] for x in v], [x[half:] for x in v])
        rows = half
    partial = [x.reshape(128) for x in v]

    @pl.when(j == 0)
    def _():
        for i in range(NUM_LIMBS):
            o_ref[i] = partial[i]

    @pl.when(j != 0)
    def _():
        acc = fr.add_limb_lists([o_ref[i] for i in range(NUM_LIMBS)], partial)
        for i in range(NUM_LIMBS):
            o_ref[i] = acc[i]


@functools.partial(jax.jit, static_argnames=("tile",))
def weighted_block_sums_128(x: jax.Array, u: jax.Array, tile: int = 8192) -> jax.Array:
    """(16, W, N) × (16, N) -> (16, W, 128) partial field sums of x[:,c]·u.

    One dispatch evaluates every committed column's barycentric sum
    Σ_j p_c(x_j)·u_j (u = x/(z−x) weights); the (16, W, 128) partials finish
    host-side.  Replaces the per-column multiply+sum loop (W+C dispatches +
    a full product materialization per column)."""
    _, w, n = x.shape
    t = min(tile, n)
    while n % t:
        t //= 2
    assert t >= 128 and t % 128 == 0
    flat = x.reshape(NUM_LIMBS, w * n)
    blocks_per_col = n // t
    out = pl.pallas_call(
        _wsum128_kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, w * 128), x.dtype),
        grid=(w, blocks_per_col),
        in_specs=[
            pl.BlockSpec(
                (NUM_LIMBS, t),
                lambda wi, j, b=blocks_per_col: (0, wi * b + j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (NUM_LIMBS, t), lambda wi, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (NUM_LIMBS, 128), lambda wi, j: (0, wi), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(flat, u)
    return out.reshape(NUM_LIMBS, w, 128)


_SCAN_LANES = 128


def _scan_kernel(x_ref, o_ref, carry_ref, *, op, identity, reverse):
    """Inclusive prefix (or suffix) scan block with cross-block carry.

    The block is (16, R, 128) — flat index (row, lane) row-major.  A flat
    Hillis-Steele shift by k decomposes into tile-friendly pieces Mosaic
    lowers cleanly: lane-steps (k < 128) are a lane concat borrowing the
    previous row's tail, row-steps (k = 128·m) are a sublane concat.  Grid
    iterations run sequentially on TPU; ``carry_ref`` is VMEM scratch
    persisting the running total across blocks.  ``op``: 'mul' (identity =
    Montgomery one) or 'add' (identity = zero).  For reverse scans the index
    maps feed blocks in reverse order and every shift mirrors."""
    r = x_ref.shape[1]
    lanes = x_ref.shape[2]
    j = pl.program_id(0)
    x = [x_ref[i] for i in range(NUM_LIMBS)]  # each (R, 128)

    combine = fr.mul_limb_lists if op == "mul" else fr.add_limb_lists

    def ident_arr(rows, cols, i):
        return jnp.full((rows, cols), identity[i], U32)

    k = 1
    while k < lanes:
        shifted = []
        for i in range(NUM_LIMBS):
            if reverse:
                nxt = jnp.concatenate([x[i][1:], ident_arr(1, lanes, i)], axis=0)
                head = nxt[:, :k]
                shifted.append(jnp.concatenate([x[i][:, k:], head], axis=1))
            else:
                prev = jnp.concatenate([ident_arr(1, lanes, i), x[i][:-1]], axis=0)
                tail = prev[:, lanes - k :]
                shifted.append(jnp.concatenate([tail, x[i][:, : lanes - k]], axis=1))
        x = combine(x, shifted)
        k *= 2
    m = 1
    while m < r:
        shifted = []
        for i in range(NUM_LIMBS):
            if reverse:
                shifted.append(
                    jnp.concatenate([x[i][m:], ident_arr(m, lanes, i)], axis=0)
                )
            else:
                shifted.append(
                    jnp.concatenate([ident_arr(m, lanes, i), x[i][:-m]], axis=0)
                )
        x = combine(x, shifted)
        m *= 2

    @pl.when(j == 0)
    def _():
        for i in range(NUM_LIMBS):
            carry_ref[i] = jnp.full((1, 1), identity[i], U32)

    carry = [carry_ref[i] for i in range(NUM_LIMBS)]  # (1, 1) broadcasts
    out = combine(x, carry)
    for i in range(NUM_LIMBS):
        o_ref[i] = out[i]
    for i in range(NUM_LIMBS):
        if reverse:
            carry_ref[i] = out[i][0:1, 0:1]
        else:
            carry_ref[i] = out[i][r - 1 : r, lanes - 1 : lanes]


@functools.partial(jax.jit, static_argnames=("op", "reverse", "tile"))
def scan(x: jax.Array, op: str = "mul", reverse: bool = False,
         tile: int = 8192) -> jax.Array:
    """Inclusive prefix/suffix scan along the last axis of (16, N) in ONE
    kernel dispatch (vs log2(N) full-width sweeps).  N must be a multiple
    of 128."""
    from ..field import oracle
    from ..field.constants import to_limbs

    n = x.shape[-1]
    assert n % _SCAN_LANES == 0
    t = min(tile, n)
    while n % t:
        t //= 2
    identity = (
        tuple(int(v) for v in to_limbs(oracle.to_mont(1)))
        if op == "mul"
        else (0,) * NUM_LIMBS
    )
    nb = n // t
    rows = t // _SCAN_LANES
    x3 = x.reshape(NUM_LIMBS, n // _SCAN_LANES, _SCAN_LANES)
    if reverse:
        spec = pl.BlockSpec(
            (NUM_LIMBS, rows, _SCAN_LANES),
            lambda i, nb=nb: (0, nb - 1 - i, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        spec = pl.BlockSpec(
            (NUM_LIMBS, rows, _SCAN_LANES),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
    kernel = functools.partial(
        _scan_kernel, op=op, identity=identity, reverse=reverse
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        grid=(nb,),
        in_specs=[spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((NUM_LIMBS, 1, 1), jnp.uint32)],
        interpret=_interpret(),
    )(x3)
    return out.reshape(NUM_LIMBS, n)


def _mul3_scalar_kernel(c_ref, a_ref, b_ref, o_ref):
    la = [a_ref[i] for i in range(NUM_LIMBS)]
    lb = [b_ref[i] for i in range(NUM_LIMBS)]
    lc = [c_ref[i] for i in range(NUM_LIMBS)]
    out = fr.mul_limb_lists(fr.mul_limb_lists(la, lb), lc)
    for i in range(NUM_LIMBS):
        o_ref[i] = out[i]


@functools.partial(jax.jit, static_argnames=("tile",))
def mul3_scalar(a: jax.Array, b: jax.Array, c: jax.Array,
                tile: int = DEFAULT_TILE) -> jax.Array:
    """a·b·c with c a single (16,) scalar — fused batch-inverse finish."""
    af, shape = _flatten(a)
    bf, _ = _flatten(b)
    n = af.shape[-1]
    t = min(tile, n)
    while n % t:
        t //= 2
    spec = pl.BlockSpec((NUM_LIMBS, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mul3_scalar_kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n), af.dtype),
        grid=(n // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(c, af, bf)
    return out.reshape(shape)


def _mul_scalar_kernel(c_ref, a_ref, o_ref):
    la = [a_ref[i] for i in range(NUM_LIMBS)]
    lc = [c_ref[i] for i in range(NUM_LIMBS)]
    out = fr.mul_limb_lists(la, lc)
    for i in range(NUM_LIMBS):
        o_ref[i] = out[i]


@functools.partial(jax.jit, static_argnames=("tile",))
def mul_scalar(a: jax.Array, c: jax.Array, tile: int = DEFAULT_TILE) -> jax.Array:
    """Multiply every element of (16, *batch) by one scalar (16,) value.

    The scalar rides in SMEM so a single compiled kernel serves every
    constant (twiddle bases, 1/N scalings, challenge powers, ...)."""
    af, shape = _flatten(a)
    n = af.shape[-1]
    t = min(tile, n)
    while n % t:
        t //= 2
    spec = pl.BlockSpec((NUM_LIMBS, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mul_scalar_kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n), af.dtype),
        grid=(n // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        interpret=_interpret(),
    )(c, af)
    return out.reshape(shape)
