"""Pallas TPU kernels for the Poseidon2 Merkle sweeps.

This is the prover's dominant cost (~75% of reference prove time,
bench.log:19; SURVEY.md §7 hard part #2).  The design constraint on this
module is **Mosaic compile time**, not arithmetic: every distinct program
shape containing the 46-round permutation costs tens of seconds to compile
on the remote-TPU backend (measured: a per-shape compress sweep ~25s, a
15-level unrolled subtree kernel ~520s).  A cold prove must therefore touch
only a handful of permutation-bearing programs:

* ``permute``  — batched width-3 permutation (3 states in, 3 out).  Used by
  the sponge absorb chain and the PoW grind.
* ``permute2`` — permutation of (l, r, 0) returning all three output words.
  One program per padded size serves 2-to-1 tree compression, Merkle leaf
  hashing of 2-wide matrices, FRI halves-leaf hashing, and the first absorb
  chunk of wider leaf hashes (the zero third word is built in-kernel).
* ``tree_step`` — ONE fixed-shape program that advances a bit-reversed
  digest layer by one tree level for *any* level size: the pairing distance
  rides in as an SMEM scalar and selects a dynamic sublane slice.  Eight
  chained dispatches build every level from 2^15 down to 2^7 of every tree
  in the prove — replacing both the per-shape halving sweeps and the
  unrolled-subtree compile bomb.

All 253-bit arithmetic inside the round bodies is the lazy-residue CIOS of
``field/fr.py``; the three external-round S-boxes are evaluated as ONE x^11
chain over the lane-concatenated state (same vector work, a third of the
emitted IR — Mosaic compile time scales with instruction count).

Layout: field batches are (16, N) uint32; per-limb values are lane vectors.
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
# Lane padding floor: one compiled permute2 program serves every call at or
# below this size (garbage lanes hash to garbage digests that are sliced
# away; the wasted work is microseconds).
MIN_LANES = 1 << 15


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
    """Run the full permutation on ``state`` = 3 lists of 16 equal-shape
    vectors (1-D lane vectors or 2-D (sublane, lane) blocks).

    Round constants are scalar SMEM reads; the three phase loops are
    fori_loops so the compiled body is one external round + one internal
    round regardless of the schedule length.  The external round's three
    S-boxes run as a single x^11 chain over the concatenation of the three
    state words along the leading axis — identical lane work, one third of
    the instruction count (Mosaic compile time is the scarce resource).
    """
    assert alpha == 11, "kernel specializes the minimal x^11 chain"
    rf2 = rounds_f // 2
    shape = jnp.shape(state[0][0])
    cat_axis = 0  # leading axis: lanes for 1-D vectors, sublanes for blocks

    def pack(s):
        return tuple(tuple(x for x in si) for si in s)

    def unpack(t):
        return [list(si) for si in t]

    def split3(v):
        k = shape[0]
        return [
            [x[0 * k : 1 * k] for x in v],
            [x[1 * k : 2 * k] for x in v],
            [x[2 * k : 3 * k] for x in v],
        ]

    state = _ext_linear(state)

    def ext_body(r, carry, base):
        s = unpack(carry)
        cat = []
        for i in range(NUM_LIMBS):
            # state < 2r plus a canonical constant: < 3r, in range for the
            # lazy S-box (no conditional subtract needed before it)
            cat.append(
                jnp.concatenate(
                    [
                        s[0][i] + const_ref[base + r, 0, i],
                        s[1][i] + const_ref[base + r, 1, i],
                        s[2][i] + const_ref[base + r, 2, i],
                    ],
                    axis=cat_axis,
                )
            )
        norm = fr._carry_norm(cat)[:NUM_LIMBS]
        out = split3(_sbox11(norm))
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


# ---------------------------------------------------------------------------
# permute: 3 states in, 3 out (sponge absorb carry, PoW grind)
# ---------------------------------------------------------------------------

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


def permute(s0, s1, s2, params: Poseidon2Params = DEFAULT_PARAMS, tile: int = DEFAULT_TILE):
    """Batched width-3 permutation; pads small batches onto the shared
    canonical program (see permute2)."""
    n = s0.shape[-1]
    n_pad = _canon(n)
    o0, o1, o2 = _permute_call(
        *_pad_many((s0, s1, s2), n_pad), params, tile
    )
    if n_pad != n:
        return _slice_many_jit((o0, o1, o2), n)
    return o0, o1, o2


@functools.partial(jax.jit, static_argnames=("params", "tile"))
def _permute_call(s0, s1, s2, params: Poseidon2Params = DEFAULT_PARAMS, tile: int = DEFAULT_TILE):
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


# ---------------------------------------------------------------------------
# permute2: (l, r, 0) -> 3 outputs (compression, leaf hashing, absorb start)
# ---------------------------------------------------------------------------

def _permute2_kernel(const_ref, l_ref, r_ref, o0_ref, o1_ref, o2_ref,
                     *, rounds_f, rounds_p, alpha):
    t_shape = l_ref.shape[-1]
    zero = jnp.zeros((t_shape,), U32)
    state = [
        [l_ref[i] for i in range(NUM_LIMBS)],
        [r_ref[i] for i in range(NUM_LIMBS)],
        [zero] * NUM_LIMBS,
    ]
    out = _rounds(state, const_ref, rounds_f, rounds_p, alpha)
    for i in range(NUM_LIMBS):
        o0_ref[i] = out[0][i]
        o1_ref[i] = out[1][i]
        o2_ref[i] = out[2][i]


@functools.partial(jax.jit, static_argnames=("params", "tile"))
def _permute2_call(left, right, params: Poseidon2Params, tile: int):
    n = left.shape[-1]
    t = min(tile, n)
    assert n % t == 0
    consts = jnp.asarray(_params_const_array(params))
    spec = pl.BlockSpec((NUM_LIMBS, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _permute2_kernel,
        rounds_f=params.rounds_f,
        rounds_p=params.rounds_p,
        alpha=params.alpha,
    )
    shape = jax.ShapeDtypeStruct((NUM_LIMBS, n), left.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(n // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=(spec, spec, spec),
        interpret=_interpret(),
    )(consts, left, right)


def _pad_lanes(x: jax.Array, n_pad: int) -> jax.Array:
    n = x.shape[-1]
    if n == n_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (n_pad - n,), x.dtype)], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _pad_many_jit(xs: tuple, n_pad: int) -> tuple:
    """Pad several arrays to n_pad lanes in ONE dispatch (each eager pad on
    the remote path costs a full dispatch round trip; round-3 ADVICE #2)."""
    return tuple(_pad_lanes(x, n_pad) for x in xs)


@functools.partial(jax.jit, static_argnames=("n",))
def _slice_many_jit(xs: tuple, n: int) -> tuple:
    """Slice several arrays back to n lanes in ONE dispatch."""
    return tuple(x[..., :n] for x in xs)


def _pad_many(xs: tuple, n_pad: int) -> tuple:
    if xs and xs[0].shape[-1] == n_pad:
        return xs
    return _pad_many_jit(xs, n_pad)


def _canon(n: int) -> int:
    """Padded size: everything at/below MIN_LANES shares one program."""
    return max(n, MIN_LANES) if not _interpret() else n


def permute2(left, right, params: Poseidon2Params = DEFAULT_PARAMS,
             tile: int = DEFAULT_TILE):
    """Permutation of (left, right, 0); returns all three output words.

    Inputs smaller than MIN_LANES are zero-padded so one compiled program
    serves every small call site (tree sweeps, FRI leaves, tiny commits).
    """
    n = left.shape[-1]
    n_pad = _canon(n)
    o0, o1, o2 = _permute2_call(
        *_pad_many((left, right), n_pad), params, tile
    )
    if n_pad != n:
        return _slice_many_jit((o0, o1, o2), n)
    return o0, o1, o2


def compress(left, right, params: Poseidon2Params = DEFAULT_PARAMS,
             tile: int = DEFAULT_TILE):
    """2-to-1 digest compression sweep: (16, M) x2 -> (16, M)."""
    return permute2(left, right, params, tile)[0]


def leaf_hash(matrix, params: Poseidon2Params = DEFAULT_PARAMS, tile: int = DEFAULT_TILE):
    """Sponge-hash the W columns of (16, W, N) into (16, N) digests.

    Rate-2 overwrite absorb as a chain of permute dispatches: only the
    capacity word (and, for an odd tail chunk, the second rate word)
    carries between chunks, so every chunk is one already-compiled
    ``permute``/``permute2`` call — no per-width kernel (a fused
    absorb-in-VMEM kernel compiled ~100s per width; the chain's extra HBM
    round trips cost ~2ms at the 2^22 commit).
    """
    return hash_columns_list([matrix[:, c] for c in range(matrix.shape[1])],
                             params, tile)


def hash_columns_list(cols, params: Poseidon2Params = DEFAULT_PARAMS,
                      tile: int = DEFAULT_TILE):
    """Rate-2 absorb chain over W columns.  Columns are padded to the shared
    canonical lane count ONCE and the padded state threads through the whole
    chain — one slice at the end (per-chunk re-pad/re-slice cost extra HBM
    round trips on the remote path; round-3 advisor)."""
    w = len(cols)
    assert w >= 1
    n = cols[0].shape[-1]
    n_pad = _canon(n)
    pc = list(_pad_many(tuple(cols), n_pad))
    if w == 1:
        z = jnp.zeros_like(pc[0])
        s0 = _permute2_call(pc[0], z, params, tile)[0]
        return s0[..., :n] if n_pad != n else s0
    s0, s1, s2 = _permute2_call(pc[0], pc[1], params, tile)
    i = RATE
    while i + 1 < w:
        s0, s1, s2 = _permute_call(pc[i], pc[i + 1], s2, params, tile)
        i += RATE
    if i < w:  # odd tail chunk: second rate word keeps its previous value
        s0, s1, s2 = _permute_call(pc[i], s1, s2, params, tile)
    return s0[..., :n] if n_pad != n else s0


# ---------------------------------------------------------------------------
# tree_step: one BR tree level for any size, one compiled program
# ---------------------------------------------------------------------------

_TREE_LANES = 128
_TREE_ROWS = 256  # buffer entries = _TREE_ROWS * _TREE_LANES = 2^15
SUBTREE_SIZE = _TREE_ROWS * _TREE_LANES
_SUBTREE_HOST = 128  # finish below this on the host (vectorized bigint)


_TREE_BLOCK_ROWS = 32  # output rows per grid step (bounds VMEM intermediates)


def _tree_step_kernel(const_ref, h_ref, x_ref, o_ref, *, rounds_f, rounds_p,
                      alpha, block_rows):
    """O[j] = compress(X[j], X[j + h]) for flat row-major j < rows/2 · 128.

    X is a (16, rows, 128) bit-reversed digest buffer whose first ``2h``
    entries are the current level; ``h`` (= pairing distance, a multiple of
    128) arrives as h/128 rows in SMEM, making the partner read a dynamic
    sublane slice — the one shape-polymorphic axis Mosaic handles.  The
    first ``h`` outputs are the next level (garbage beyond — positions that
    pair valid-with-stale — is never read back as valid data).  The grid
    walks output row-blocks so the 33-limb CIOS accumulators stay within
    scoped VMEM; the input buffer rides whole (2 MB).
    """
    h_rows = h_ref[0]
    base = pl.program_id(0) * block_rows
    l0 = [x_ref[i, pl.ds(base, block_rows), :] for i in range(NUM_LIMBS)]
    l1 = [x_ref[i, pl.ds(h_rows + base, block_rows), :] for i in range(NUM_LIMBS)]
    zero = jnp.zeros((block_rows, _TREE_LANES), U32)
    out = _rounds([l0, l1, [zero] * NUM_LIMBS], const_ref, rounds_f, rounds_p, alpha)
    for i in range(NUM_LIMBS):
        o_ref[i] = out[0][i]


@functools.partial(jax.jit, static_argnames=("params",))
def _tree_step(buf, h_rows, params: Poseidon2Params):
    consts = jnp.asarray(_params_const_array(params))
    rows, lanes = buf.shape[1], buf.shape[2]
    block_rows = min(_TREE_BLOCK_ROWS, rows // 2)
    kernel = functools.partial(
        _tree_step_kernel,
        rounds_f=params.rounds_f,
        rounds_p=params.rounds_p,
        alpha=params.alpha,
        block_rows=block_rows,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, rows // 2, lanes), buf.dtype),
        grid=(rows // 2 // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (NUM_LIMBS, rows, lanes), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (NUM_LIMBS, block_rows, lanes), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(consts, h_rows, buf)


def subtree_levels(d_br: jax.Array, params: Poseidon2Params = DEFAULT_PARAMS) -> list:
    """All upper levels of a bit-reversed (16, N) digest layer (N a power of
    two >= 256; the production call site uses N = SUBTREE_SIZE).

    Returns [(16, N/2), (16, N/4), ..., (16, 1)] — each level in
    bit-reversed index order.  Levels down to _SUBTREE_HOST come from chained
    ``tree_step`` dispatches (one compiled program, h in SMEM); the tiny top
    finishes host-side with the vectorized bigint sponge, costing one device
    fetch — the caller's root observe needs that sync anyway.
    """
    n = d_br.shape[-1]
    assert n % (2 * _TREE_LANES) == 0 and n & (n - 1) == 0
    buf = d_br.reshape(NUM_LIMBS, n // _TREE_LANES, _TREE_LANES)
    levels = []
    h_rows = n // _TREE_LANES // 2
    while h_rows * _TREE_LANES >= _SUBTREE_HOST:
        out = _tree_step(buf, jnp.asarray([h_rows], dtype=jnp.int32), params)
        levels.append(
            out.reshape(NUM_LIMBS, n // 2)[:, : h_rows * _TREE_LANES]
        )
        buf = jnp.concatenate([out, out], axis=1)
        h_rows //= 2

    # host finish: _SUBTREE_HOST entries -> log2 more levels + root
    tail, _root = host_subtree_finish(levels[-1][:, :_SUBTREE_HOST], params)
    levels.extend(tail)
    return levels


def host_subtree_finish(top: jax.Array, params: Poseidon2Params = DEFAULT_PARAMS) -> tuple:
    """Finish a tiny BIT-REVERSED digest layer host-side: compressing the
    two halves yields the next level already bit-reversed over one fewer
    bit (the natural pair (2s, 2s+1) sits at (j, j + size/2) in BR order).
    Returns ``(levels, root_int)`` — levels as device arrays, root last.
    Blocks on a device->host fetch — callers observe the root immediately
    anyway, and the returned canonical root int saves them a SECOND fetch
    (~12 trees × ~15 ms RTT per prove).  Runs through the native C engine
    when available (the object-array sponge cost ~25 ms per tree)."""
    from ..hash import native_engine as ne

    out = []
    if ne.available() and params.alpha == 11:
        rows = ne.from_mont(ne.planes_to_u64(np.asarray(top)))
        size = rows.shape[0]
        while size > 1:
            half = size // 2
            rows = ne.compress(rows[:half], rows[half:], params)
            out.append(jnp.asarray(ne.u64_to_planes(ne.to_mont(rows))))
            size = half
        root = ne.u64_to_ints(rows)[0]
    else:
        from ..hash import np_poseidon2 as npp

        vals = np.array(fr.unpack_ints(np.asarray(top)), dtype=object)
        size = vals.shape[-1]
        while size > 1:
            half = size // 2
            vals = npp.compress_vec(vals[:half], vals[half:], params)
            size = half
            out.append(jnp.asarray(fr.pack_ints(list(vals))))
        root = int(vals[0])
    return out, root
