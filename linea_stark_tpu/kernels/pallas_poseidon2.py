"""Pallas TPU kernels for the Poseidon2 Merkle sweeps.

This is the prover's dominant cost (~75% of reference prove time,
bench.log:19; SURVEY.md §7 hard part #2).  Three kernels:

* ``permute``    — batched width-3 permutation, state resident in VMEM for
  all 46 rounds (round loop is a ``fori_loop``; round constants ride in SMEM
  so the kernel is constant-schedule-agnostic and compiles once).
* ``leaf_hash``  — whole sponge absorb of a W-column block per grid step:
  the state never round-trips to HBM between the ⌈W/2⌉ chunk permutations.
* ``compress``   — 2-to-1 digest compression sweep for tree levels.

Lane layout: field batches (16, N) uint32, blocks (16, TILE) with per-limb
lane vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fr, oracle
from ..field.constants import NUM_LIMBS, to_limbs
from ..hash.poseidon2 import Poseidon2Params, DEFAULT_PARAMS, RATE
from .pallas_field import _interpret

U32 = jnp.uint32
DEFAULT_TILE = 1024


def _params_const_array(params: Poseidon2Params) -> np.ndarray:
    """(rounds_f + rounds_p, 3, 16) uint32 Montgomery constant schedule.

    External halves first/last; internal rounds use slot 0 only (slots 1, 2
    zero).  Row order matches the permutation's round order.
    """
    rows = []
    for rc in params.external_constants(0):
        rows.append([to_limbs(oracle.to_mont(c)) for c in rc])
    for c in params.internal_constants():
        rows.append([to_limbs(oracle.to_mont(c)), to_limbs(0), to_limbs(0)])
    for rc in params.external_constants(1):
        rows.append([to_limbs(oracle.to_mont(c)) for c in rc])
    return np.asarray(rows, dtype=np.uint32)


def _sbox11(l: list) -> list:
    """x^11 = x^8 · x^3 — 3 squarings + 2 multiplies (alpha = 11).

    All lazy (< 2r residues, no final conditional subtract): the input is
    < 3r (state < 2r plus a canonical round constant), every product of
    inputs < 3r is < 2r, so the chain is closed without reduction."""
    x2 = fr.sqr_limb_lists(l, reduce_final=False)
    x3 = fr.mul_limb_lists(x2, l, reduce_final=False)
    x4 = fr.sqr_limb_lists(x2, reduce_final=False)
    x8 = fr.sqr_limb_lists(x4, reduce_final=False)
    return fr.mul_limb_lists(x8, x3, reduce_final=False)


def _ext_linear(s):
    add = fr.add_limb_lists_lazy
    t = add(add(s[0], s[1]), s[2])
    return [add(si, t) for si in s]


def _int_linear(s):
    add = fr.add_limb_lists_lazy
    t = add(add(s[0], s[1]), s[2])
    s2d = add(s[2], s[2])
    return [
        add(s[0], t),
        add(s[1], t),
        add(s2d, t),
    ]


def _rounds(state, const_ref, rounds_f: int, rounds_p: int, alpha: int):
    """Run the full permutation on `state` = 3 lists of 16 (T,) vectors.

    Round constants are scalar SMEM reads; the three phase loops are
    fori_loops so the compiled body is one external round + one internal
    round regardless of the schedule length.
    """
    assert alpha == 11, "kernel specializes the minimal x^11 chain"
    rf2 = rounds_f // 2

    def pack(s):
        return tuple(tuple(x for x in si) for si in s)

    def unpack(t):
        return [list(si) for si in t]

    state = _ext_linear(state)

    def ext_body(r, carry, base):
        s = unpack(carry)
        out = []
        for k in range(3):
            # state < 2r plus a canonical constant: < 3r, in range for the
            # lazy S-box (no conditional subtract needed before it)
            with_c = [s[k][i] + const_ref[base + r, k, i] for i in range(NUM_LIMBS)]
            norm = fr._carry_norm(with_c)[:NUM_LIMBS]
            out.append(_sbox11(norm))
        return pack(_ext_linear(out))

    def int_body(r, carry):
        s = unpack(carry)
        with_c = [s[0][i] + const_ref[rf2 + r, 0, i] for i in range(NUM_LIMBS)]
        norm = fr._carry_norm(with_c)[:NUM_LIMBS]
        s[0] = _sbox11(norm)
        return pack(_int_linear(s))

    carry = pack(state)
    carry = jax.lax.fori_loop(0, rf2, lambda r, c: ext_body(r, c, 0), carry)
    carry = jax.lax.fori_loop(0, rounds_p, int_body, carry)
    carry = jax.lax.fori_loop(
        0, rf2, lambda r, c: ext_body(r, c, rf2 + rounds_p), carry
    )
    # Lazy residues (< 2r) -> canonical: one conditional subtract per output.
    return [fr._cond_sub_r(si) for si in unpack(carry)]


def _permute_kernel(const_ref, s0_ref, s1_ref, s2_ref, o0_ref, o1_ref, o2_ref,
                    *, rounds_f, rounds_p, alpha):
    state = [
        [s0_ref[i] for i in range(NUM_LIMBS)],
        [s1_ref[i] for i in range(NUM_LIMBS)],
        [s2_ref[i] for i in range(NUM_LIMBS)],
    ]
    out = _rounds(state, const_ref, rounds_f, rounds_p, alpha)
    for i in range(NUM_LIMBS):
        o0_ref[i] = out[0][i]
        o1_ref[i] = out[1][i]
        o2_ref[i] = out[2][i]


@functools.partial(jax.jit, static_argnames=("params", "tile"))
def permute(s0, s1, s2, params: Poseidon2Params = DEFAULT_PARAMS, tile: int = DEFAULT_TILE):
    n = s0.shape[-1]
    t = min(tile, n)
    assert n % t == 0
    consts = jnp.asarray(_params_const_array(params))
    spec = pl.BlockSpec((NUM_LIMBS, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _permute_kernel,
        rounds_f=params.rounds_f,
        rounds_p=params.rounds_p,
        alpha=params.alpha,
    )
    shape = jax.ShapeDtypeStruct((NUM_LIMBS, n), s0.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(n // t,),
        in_specs=[cspec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=_interpret(),
    )(consts, s0, s1, s2)


def _leaf_kernel(const_ref, m_ref, o_ref, *, width, rounds_f, rounds_p, alpha):
    t_shape = m_ref.shape[-1]
    zero = jnp.zeros((t_shape,), U32)
    s = [[zero] * NUM_LIMBS, [zero] * NUM_LIMBS, [zero] * NUM_LIMBS]
    for c0 in range(0, width, RATE):
        s[0] = [m_ref[i, c0] for i in range(NUM_LIMBS)]
        if c0 + 1 < width:
            s[1] = [m_ref[i, c0 + 1] for i in range(NUM_LIMBS)]
        s = _rounds(s, const_ref, rounds_f, rounds_p, alpha)
    for i in range(NUM_LIMBS):
        o_ref[i] = s[0][i]


@functools.partial(jax.jit, static_argnames=("params", "tile"))
def leaf_hash(matrix, params: Poseidon2Params = DEFAULT_PARAMS, tile: int = DEFAULT_TILE):
    """Sponge-hash the W columns of (16, W, N) into (16, N) digests.

    One kernel launch; each grid step absorbs a (16, W, TILE) block with the
    running state held in registers across all ⌈W/2⌉ permutations.
    """
    w, n = matrix.shape[1], matrix.shape[-1]
    t = min(tile, n)
    assert n % t == 0
    consts = jnp.asarray(_params_const_array(params))
    kernel = functools.partial(
        _leaf_kernel,
        width=w,
        rounds_f=params.rounds_f,
        rounds_p=params.rounds_p,
        alpha=params.alpha,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n), matrix.dtype),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NUM_LIMBS, w, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NUM_LIMBS, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(consts, matrix)


def _tree_kernel(const_ref, d_ref, *o_refs, rounds_f, rounds_p, alpha):
    """Build every level above a (16, N) digest layer in one dispatch.

    Input and outputs are in BIT-REVERSED index order: the natural tree's
    adjacent-pair compression (i, i^1) becomes first-half/second-half pairing
    in bit-reversed order — contiguous static slices, which Mosaic lowers
    cleanly (a (half, 2) deinterleave reshape does not).  The whole subtree
    stays VMEM-resident — one launch replaces log2(N) halving sweeps, which
    on a remote TPU were pure dispatch latency."""
    cur = [d_ref[i] for i in range(NUM_LIMBS)]
    n = d_ref.shape[-1]
    for l in range(len(o_refs)):
        half = n // 2
        left = [c[:half] for c in cur]
        right = [c[half:] for c in cur]
        zero = jnp.zeros((half,), U32)
        s = _rounds([left, right, [zero] * NUM_LIMBS], const_ref,
                    rounds_f, rounds_p, alpha)
        cur = s[0]
        for i in range(NUM_LIMBS):
            o_refs[l][i] = cur[i]
        n = half


@functools.partial(jax.jit, static_argnames=("params",))
def tree_levels_br(d_br, params: Poseidon2Params = DEFAULT_PARAMS):
    """Bit-reversed (16, N) digest layer -> tuple of bit-reversed upper
    levels ((16, N/2) ... (16, 1)).  N <= 2^15 (VMEM residency)."""
    n = d_br.shape[-1]
    levels = n.bit_length() - 1
    assert 1 << levels == n and n <= (1 << 15)
    consts = jnp.asarray(_params_const_array(params))
    kernel = functools.partial(
        _tree_kernel,
        rounds_f=params.rounds_f,
        rounds_p=params.rounds_p,
        alpha=params.alpha,
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((NUM_LIMBS, n >> (l + 1)), d_br.dtype)
        for l in range(levels)
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(levels)
        ),
        interpret=_interpret(),
    )(consts, d_br)


def _compress_kernel(const_ref, l_ref, r_ref, o_ref, *, rounds_f, rounds_p, alpha):
    t_shape = l_ref.shape[-1]
    zero = jnp.zeros((t_shape,), U32)
    s = [
        [l_ref[i] for i in range(NUM_LIMBS)],
        [r_ref[i] for i in range(NUM_LIMBS)],
        [zero] * NUM_LIMBS,
    ]
    s = _rounds(s, const_ref, rounds_f, rounds_p, alpha)
    for i in range(NUM_LIMBS):
        o_ref[i] = s[0][i]


@functools.partial(jax.jit, static_argnames=("params", "tile"))
def compress(left, right, params: Poseidon2Params = DEFAULT_PARAMS, tile: int = DEFAULT_TILE):
    """2-to-1 compression sweep: (16, M) x2 -> (16, M)."""
    n = left.shape[-1]
    t = min(tile, n)
    assert n % t == 0
    consts = jnp.asarray(_params_const_array(params))
    spec = pl.BlockSpec((NUM_LIMBS, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _compress_kernel,
        rounds_f=params.rounds_f,
        rounds_p=params.rounds_p,
        alpha=params.alpha,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n), left.dtype),
        grid=(n // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(consts, left, right)
