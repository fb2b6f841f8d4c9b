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
