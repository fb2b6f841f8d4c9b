"""Vectorized BLS12-377 Fr arithmetic on limb-packed JAX arrays.

This is the TPU-native replacement for the ark-ff Montgomery bigint backend
that sits under every hot loop of the reference prover (SURVEY.md §2c:
``ark-ff``/``ark-ff-asm`` is "the innermost native hot loop").

Representation
--------------
A batch of field elements is a ``uint32`` array of shape ``(16, *batch)``:
axis 0 holds 16 little-endian 16-bit limbs, all remaining axes are free batch
dimensions (the last axis is conventionally the trace-row/domain axis so it
lands in TPU vector lanes).  Values are kept canonical (< r) and in Montgomery
form (x·R mod r, R = 2**256) except where noted.

Why 16-bit limbs: the TPU VPU has no widening integer multiply, so limb
products must fit exactly in the 32-bit lanes; 16×16→32 does.  Accumulators
stay below 2**22 (bounds in comments), so the schoolbook/CIOS accumulation
never wraps.

All functions are pure jnp and usable both at trace level and inside Pallas
kernel bodies.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import oracle
from .constants import (
    LIMB_BITS,
    LIMB_MASK,
    MODULUS_LIMBS,
    MONT_R2,
    NUM_LIMBS,
    R_MOD,
    to_limbs,
)

U32 = jnp.uint32
# Plain Python ints: weakly-typed scalars combine with uint32 arrays without
# promotion and are legal inside Pallas kernel bodies (jnp scalar constants
# would be captured as closure constants there).
_MASK = LIMB_MASK
_R_LIMBS = [int(v) for v in MODULUS_LIMBS]


# ---------------------------------------------------------------------------
# Constructors / converters
# ---------------------------------------------------------------------------

def zeros(batch_shape=()) -> jax.Array:
    return jnp.zeros((NUM_LIMBS, *batch_shape), dtype=U32)


def full(batch_shape, value_int: int, mont: bool = True) -> jax.Array:
    """Broadcast a single field value (Python int, canonical) to a batch."""
    v = oracle.to_mont(value_int % R_MOD) if mont else value_int % R_MOD
    limbs = to_limbs(v)
    out = jnp.asarray(limbs, dtype=U32).reshape((NUM_LIMBS,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(out, (NUM_LIMBS, *batch_shape))


def ones(batch_shape=()) -> jax.Array:
    return full(batch_shape, 1)


def const(value_int: int, mont: bool = True) -> jax.Array:
    """A single (unbatched) constant, shape (16,)."""
    v = oracle.to_mont(value_int % R_MOD) if mont else value_int % R_MOD
    return jnp.asarray(to_limbs(v), dtype=U32)


def pack_ints(values, mont: bool = True) -> np.ndarray:
    """Host helper: list of canonical Python ints -> uint32 (16, N).

    Vectorized over numpy object (bigint) arrays — the per-element Python
    loop dominated host marshalling time at query/trace scale."""
    vals = np.array([int(v) for v in values], dtype=object) % R_MOD
    if mont:
        vals = (vals * oracle.MONT_R) % R_MOD
    out = np.empty((NUM_LIMBS, len(values)), dtype=np.uint32)
    for i in range(NUM_LIMBS):
        out[i] = ((vals >> (LIMB_BITS * i)) & LIMB_MASK).astype(np.uint32)
    return out


def unpack_ints(arr, mont: bool = True) -> list:
    """Host helper: uint32 (16, N) -> list of canonical Python ints."""
    a = np.asarray(arr)
    flat = a.reshape(NUM_LIMBS, -1).astype(object)
    acc = flat[NUM_LIMBS - 1]
    for i in range(NUM_LIMBS - 2, -1, -1):
        acc = acc * (1 << LIMB_BITS) + flat[i]
    if mont:
        acc = (acc * oracle.MONT_R_INV) % R_MOD
    return acc.tolist()


# ---------------------------------------------------------------------------
# Limb plumbing
# ---------------------------------------------------------------------------

def _as_list(a: jax.Array) -> list:
    return [a[i] for i in range(a.shape[0])]


def _stack(limbs: list) -> jax.Array:
    return jnp.stack(limbs, axis=0)


def _carry_norm(limbs: list) -> list:
    """Propagate carries so every limb is < 2**16.  Input limbs < 2**31."""
    out = []
    carry = None
    for l in limbs:
        t = l if carry is None else l + carry
        out.append(t & _MASK)
        carry = t >> LIMB_BITS
    out.append(carry)
    return out


def _sub_borrow(a: list, b_limbs) -> tuple[list, jax.Array]:
    """a - b limbwise (both canonical 16-bit); returns (limbs, borrow_flag)."""
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(NUM_LIMBS):
        bi = b_limbs[i] if isinstance(b_limbs, list) else b_limbs[i]
        d = a[i] - bi - borrow
        out.append(d & _MASK)
        borrow = d >> 31  # wrapped (negative) iff top bit set: operands < 2**17
    return out, borrow


def _cond_sub_r(limbs: list) -> list:
    """Subtract r if the 16-limb value is >= r (value must be < 2r)."""
    t, borrow = _sub_borrow(limbs, _R_LIMBS)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, limbs[i], t[i]) for i in range(NUM_LIMBS)]


_R2X_LIMBS = [int(v) for v in to_limbs(2 * R_MOD)]


def _cond_sub_2r(limbs: list) -> list:
    """Subtract 2r if the 16-limb value is >= 2r (value must be < 4r).

    Keeps lazy (< 2r, non-canonical) residues bounded through long in-kernel
    chains: the Montgomery product of inputs < 3r is < 2r without any final
    conditional subtract, so only additions need this half-reduction."""
    t, borrow = _sub_borrow(limbs, _R2X_LIMBS)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, limbs[i], t[i]) for i in range(NUM_LIMBS)]


# ---------------------------------------------------------------------------
# Ring ops (Montgomery-form agnostic: add/sub/neg work for any residues)
# ---------------------------------------------------------------------------

def add_limb_lists(la: list, lb: list) -> list:
    s = _carry_norm([la[i] + lb[i] for i in range(NUM_LIMBS)])
    # a, b < r < 2**253 so the sum fits in 16 limbs (carry-out is zero).
    return _cond_sub_r(s[:NUM_LIMBS])


def sub_limb_lists(la: list, lb: list) -> list:
    d, borrow = _sub_borrow(la, lb)
    # If a < b, add r back (single pass, result < r so no further carry-out).
    addback = borrow  # 0 or 1
    carry = jnp.zeros_like(d[0])
    out = []
    for i in range(NUM_LIMBS):
        t = d[i] + addback * _R_LIMBS[i] + carry
        out.append(t & _MASK)
        carry = t >> LIMB_BITS
    return out


def add(a: jax.Array, b: jax.Array) -> jax.Array:
    return _stack(add_limb_lists(_as_list(a), _as_list(b)))


def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    return _stack(sub_limb_lists(_as_list(a), _as_list(b)))


def neg(a: jax.Array) -> jax.Array:
    return sub(zeros(a.shape[1:]), a)


def double(a: jax.Array) -> jax.Array:
    return add(a, a)


def _r_stacked() -> jax.Array:
    # Fresh constant per call: caching device arrays in module globals would
    # leak tracers between jit/scan traces.
    return jnp.asarray(np.asarray(MODULUS_LIMBS), dtype=U32)


def _pad_add(acc: jax.Array, val: jax.Array, offset: int) -> jax.Array:
    """acc[offset:offset+16] += val, expressed as zero-pad + add so XLA sees a
    single fusible elementwise op instead of a dynamic-update-slice chain."""
    total = acc.shape[0]
    pad = [(offset, total - NUM_LIMBS - offset)] + [(0, 0)] * (acc.ndim - 1)
    return acc + jnp.pad(val, pad)


def _mont_reduce_acc(acc: list, zero, reduce_final: bool) -> list:
    """Shared Montgomery reduction pass over a (2·16+1)-entry schoolbook
    accumulator.  With ``reduce_final`` the result is canonical (< r); without
    it the result is < 2r whenever the operand product ab < 3r·3r — lazy
    residues for in-kernel chains (callers keep values < 3r via
    :func:`_cond_sub_2r` on additions)."""
    for i in range(NUM_LIMBS):
        m = (zero - acc[i]) & _MASK  # -r^{-1} mod 2^16 == 0xFFFF
        for j in range(NUM_LIMBS):
            rj = _R_LIMBS[j]
            # The modulus' limb structure saves ~25% of the reduction pass:
            # r_1 = 0 (skip), r_0 = r_4 = 1 (no multiply, no hi word),
            # r_2 = 0x8000 (a shift).
            if rj == 0:
                continue
            if rj == 1:
                acc[i + j] = acc[i + j] + m
                continue
            if rj & (rj - 1) == 0:
                p = m << (rj.bit_length() - 1)  # < 2**31: no overflow
            else:
                p = m * rj
            acc[i + j] = acc[i + j] + (p & _MASK)
            acc[i + j + 1] = acc[i + j + 1] + (p >> LIMB_BITS)
        # acc[i] is now ≡ 0 mod 2**16; fold its carry into the next limb.
        acc[i + 1] = acc[i + 1] + (acc[i] >> LIMB_BITS)
    res = _carry_norm(acc[NUM_LIMBS : 2 * NUM_LIMBS + 1])
    # value < 2r < 2**254 (lazy) resp. < r (canonical): fits in 16 limbs.
    if reduce_final:
        return _cond_sub_r(res[:NUM_LIMBS])
    return res[:NUM_LIMBS]


def mul_limb_lists(la: list, lb: list, reduce_final: bool = True) -> list:
    """Core CIOS Montgomery product on per-limb arrays (any broadcastable
    shapes).  Used directly inside Pallas kernel bodies (where Mosaic keeps
    every intermediate in registers/VMEM) and by the stacked XLA wrapper.

    Accumulator bound: schoolbook pass contributes < 32·2**16 per position,
    the reduction pass another < 32·2**16 plus small carries — all < 2**22,
    far under the uint32 ceiling, so no intermediate normalization is needed.
    """
    zero = jnp.zeros(jnp.broadcast_shapes(jnp.shape(la[0]), jnp.shape(lb[0])), U32)
    acc = [zero] * (2 * NUM_LIMBS + 1)
    for i in range(NUM_LIMBS):
        ai = la[i]
        for j in range(NUM_LIMBS):
            p = ai * lb[j]
            acc[i + j] = acc[i + j] + (p & _MASK)
            acc[i + j + 1] = acc[i + j + 1] + (p >> LIMB_BITS)
    return _mont_reduce_acc(acc, zero, reduce_final)


def sqr_limb_lists(la: list, reduce_final: bool = True) -> list:
    """Montgomery squaring: the off-diagonal limb products a_i·a_j (i<j) are
    accumulated once and the accumulator doubled — 136 lane multiplies vs the
    256 of the general product (the S-box chain x² x⁴ x⁸ is 3 of its 5
    multiplies, so this trims ~28% of the Poseidon2 kernel's schoolbook work).

    Accumulator bound: off-diagonal ≤ 15·(2**16−1) < 2**20, doubled < 2**21,
    plus diagonal and reduction contributions — still < 2**23 ≪ 2**32."""
    zero = jnp.zeros(jnp.shape(la[0]), U32)
    acc = [zero] * (2 * NUM_LIMBS + 1)
    for i in range(NUM_LIMBS):
        ai = la[i]
        for j in range(i + 1, NUM_LIMBS):
            p = ai * la[j]
            acc[i + j] = acc[i + j] + (p & _MASK)
            acc[i + j + 1] = acc[i + j + 1] + (p >> LIMB_BITS)
    acc = [a + a for a in acc]
    for i in range(NUM_LIMBS):
        p = la[i] * la[i]
        acc[2 * i] = acc[2 * i] + (p & _MASK)
        acc[2 * i + 1] = acc[2 * i + 1] + (p >> LIMB_BITS)
    return _mont_reduce_acc(acc, zero, reduce_final)


def add_limb_lists_lazy(la: list, lb: list) -> list:
    """Lazy addition for in-kernel chains: result < 2r given inputs < 2r
    (carry-normalize + one conditional subtract of 2r, never of r).  Paired
    with ``reduce_final=False`` multiplies this keeps every Poseidon2 round
    value < 3r with a single canonicalizing subtract at kernel output."""
    s = _carry_norm([la[i] + lb[i] for i in range(NUM_LIMBS)])
    # a, b < 2r < 2**254 so the sum < 4r fits in 16 limbs (carry-out zero).
    return _cond_sub_2r(s[:NUM_LIMBS])


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product a·b·R^{-1} mod r (CIOS, radix 2**16).

    Dispatches between two implementations with identical semantics:

    * ``mul_wide`` — fully unrolled stacked-limb CIOS, ~400 HLO ops per
      multiply.  Fastest at runtime (XLA fuses across the whole chain) but
      expensive to compile; used on TPU where the truly hot per-element ops
      go through the Pallas kernels anyway.
    * ``mul_scan`` — interleaved CIOS as a 16-step ``lax.scan``, ~30 HLO ops
      per multiply.  This is the compile-friendly form: XLA-CPU compile of a
      full prove graph (and GSPMD partitioning of the sharded pipeline over a
      virtual mesh) is minutes with ``mul_wide`` and seconds with
      ``mul_scan``.  Default on CPU (tests, the multi-chip dryrun).

    Override with ``LINEA_FR_MUL=scan|wide``.
    """
    return mul_scan(a, b) if _use_scan_mul() else mul_wide(a, b)


_MUL_IMPL_RESOLVED: bool | None = None


def _use_scan_mul() -> bool:
    global _MUL_IMPL_RESOLVED
    if _MUL_IMPL_RESOLVED is None:
        import os

        choice = os.environ.get("LINEA_FR_MUL", "auto")
        if choice == "auto":
            choice = "scan" if jax.default_backend() == "cpu" else "wide"
        _MUL_IMPL_RESOLVED = choice == "scan"
    return _MUL_IMPL_RESOLVED


def mul_scan(a: jax.Array, b: jax.Array) -> jax.Array:
    """Interleaved CIOS Montgomery product as a ``lax.scan`` over b's limbs.

    Per step: accumulate a·b_j and m·r at fixed limb offsets, then shift the
    accumulator right one limb — the emitted graph is one small scan body
    instead of a 16×-unrolled chain.  Accumulator bound: each limb gathers
    ≤ 4·(2**16−1) + carries per step over ≤ 16 steps, < 2**22 ≪ 2**32.
    """
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    def _align(x):
        pad = (1,) * (len(batch) - (x.ndim - 1))
        x = x.reshape((NUM_LIMBS,) + pad + x.shape[1:])
        return jnp.broadcast_to(x, (NUM_LIMBS, *batch))

    a = _align(a)
    b = _align(b)
    r = _r_stacked().reshape((NUM_LIMBS,) + (1,) * len(batch))

    def pad1(val, off):
        pad = [(off, 1 - off)] + [(0, 0)] * len(batch)
        return jnp.pad(val, pad)

    def body(acc, b_j):
        p = a * b_j[None]
        acc = acc + pad1(p & _MASK, 0) + pad1(p >> LIMB_BITS, 1)
        m = (jnp.zeros_like(acc[0]) - acc[0]) & _MASK  # -r^{-1} mod 2^16
        q = m[None] * r
        acc = acc + pad1(q & _MASK, 0) + pad1(q >> LIMB_BITS, 1)
        carry = acc[0] >> LIMB_BITS  # acc[0] ≡ 0 mod 2^16 now
        acc = jnp.concatenate(
            [acc[1:2] + carry[None], acc[2:], jnp.zeros((1, *batch), U32)], axis=0
        )
        return acc, None

    acc0 = jnp.zeros((NUM_LIMBS + 1, *batch), dtype=U32)
    acc, _ = jax.lax.scan(body, acc0, b)
    res = _carry_norm([acc[i] for i in range(NUM_LIMBS + 1)])
    # value < 2r < 2**254: fits in 16 limbs after normalization.
    return _stack(_cond_sub_r(res[:NUM_LIMBS]))


def mul_wide(a: jax.Array, b: jax.Array) -> jax.Array:
    """Unrolled stacked-limb CIOS: each of the 16 schoolbook steps multiplies
    the whole 16-limb stack of ``a`` by one scalar limb of ``b`` (one wide
    VPU multiply), splits lo/hi, and accumulates with shifted zero-padded
    adds.  The per-element hot path on TPU is the Pallas kernel (kernels/),
    which uses :func:`mul_limb_lists` instead."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (NUM_LIMBS, *batch))
    acc = jnp.zeros((2 * NUM_LIMBS + 1, *batch), dtype=U32)
    for j in range(NUM_LIMBS):
        p = a * b[j]
        acc = _pad_add(acc, p & _MASK, j)
        acc = _pad_add(acc, p >> LIMB_BITS, j + 1)
    r = _r_stacked().reshape((NUM_LIMBS,) + (1,) * len(batch))
    carry = jnp.zeros(batch, dtype=U32)
    for i in range(NUM_LIMBS):
        head = acc[i] + carry
        m = (jnp.zeros_like(head) - head) & _MASK  # -r^{-1} mod 2^16 == 0xFFFF
        p = m * r
        lo, hi = p & _MASK, p >> LIMB_BITS
        acc = _pad_add(acc, lo, i)
        acc = _pad_add(acc, hi, i + 1)
        # head + lo[0] ≡ 0 mod 2**16; its upper bits carry into limb i+1.
        carry = (head + lo[0]) >> LIMB_BITS
    res = _carry_norm([acc[NUM_LIMBS] + carry] + [acc[k] for k in range(NUM_LIMBS + 1, 2 * NUM_LIMBS + 1)])
    # value < 2r < 2**254: fits in 16 limbs after normalization.
    return _stack(_cond_sub_r(res[:NUM_LIMBS]))


def square(a: jax.Array) -> jax.Array:
    return mul(a, a)


def mul_const(a: jax.Array, c_int: int) -> jax.Array:
    """Multiply by a compile-time constant (canonical int).

    The constant is pre-converted so that a single Montgomery multiply by
    (c·R mod r) yields a·c in Montgomery form.
    """
    c = const(c_int)
    return mul(a, c.reshape((NUM_LIMBS,) + (1,) * (a.ndim - 1)))


def pow_const(a: jax.Array, e: int) -> jax.Array:
    """a**e for a static Python-int exponent (square-and-multiply).

    Small exponents are unrolled (minimal multiply chains matter for the
    Poseidon2 S-box); large ones (Fermat inversion) run as a lax.scan over the
    exponent bits so the emitted graph stays two multiplies wide.
    """
    assert e >= 0
    if e == 0:
        return ones(a.shape[1:])
    if e.bit_length() <= 16 and not (_use_scan_mul() and e > 3):
        result = None
        base = a
        while True:
            if e & 1:
                result = base if result is None else mul(result, base)
            e >>= 1
            if e == 0:
                break
            base = square(base)
        return result

    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=np.uint32)
    )
    one = ones(a.shape[1:])

    def body(carry, bit):
        result, base = carry
        factor = select(jnp.broadcast_to(bit.astype(jnp.bool_), a.shape[1:]), base, one)
        return (mul(result, factor), square(base)), None

    (result, _), _ = jax.lax.scan(body, (one, a), bits)
    return result


def inv(a: jax.Array) -> jax.Array:
    """Elementwise inverse by Fermat (a**(r-2)); a must be nonzero.

    Prefer :func:`batch_inverse` on large batches — it needs only O(log N)
    multiplies per element instead of ~380 (the reference inverts per-row with
    no batching at all: trace/src/permutation.rs:70, SURVEY.md §3.2).
    """
    return pow_const(a, R_MOD - 2)


# ---------------------------------------------------------------------------
# Predicates / selection
# ---------------------------------------------------------------------------

def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(a == 0, axis=0)


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=0)


def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise where(mask, a, b); mask has the batch shape."""
    return jnp.where(mask[None, ...], a, b)


# ---------------------------------------------------------------------------
# Montgomery-domain conversion
# ---------------------------------------------------------------------------

_R2_CONST = None


def _r2(batch_ndim: int) -> jax.Array:
    c = jnp.asarray(to_limbs(MONT_R2), dtype=U32)
    return c.reshape((NUM_LIMBS,) + (1,) * batch_ndim)


def to_mont(a: jax.Array) -> jax.Array:
    """Canonical residue limbs -> Montgomery form."""
    return mul(a, _r2(a.ndim - 1))


def from_mont(a: jax.Array) -> jax.Array:
    """Montgomery form -> canonical residue limbs (multiplies by 1)."""
    one = jnp.zeros((NUM_LIMBS,) + (1,) * (a.ndim - 1), dtype=U32).at[0].set(1)
    return mul(a, one)


# ---------------------------------------------------------------------------
# Prefix scans / batch inversion (compile-lean single-scan formulations)
# ---------------------------------------------------------------------------

def prefix_scan(
    x: jax.Array, op: str = "mul", reverse: bool = False, combine=None
) -> jax.Array:
    """Inclusive prefix (suffix with ``reverse``) product/sum along the last
    axis, as ONE ``lax.scan`` over Hillis-Steele doubling offsets.

    The shift-by-k is a gather at clip(i∓k) plus a validity select, so every
    doubling step shares one compiled body with a single field multiply (the
    unrolled form emits log2(N) separate multiply graphs — XLA compile time,
    not arithmetic, is the binding constraint on the non-Pallas path).
    ``combine`` overrides the combine op (e.g. a Pallas kernel when tracing
    the scan into a larger jitted phase on TPU).
    """
    n = x.shape[-1]
    if n <= 1:
        return x
    if combine is None:
        combine = mul if op == "mul" else add
    steps = (n - 1).bit_length()
    ks = jnp.asarray([1 << t for t in range(steps)], dtype=jnp.int32)
    i = jnp.arange(n, dtype=jnp.int32)

    def body(v, k):
        if reverse:
            idx = jnp.minimum(i + k, n - 1)
            valid = (i + k) < n
        else:
            idx = jnp.maximum(i - k, 0)
            valid = i >= k
        g = jnp.take(v, idx, axis=-1)
        return jnp.where(valid, combine(v, g), v), None

    out, _ = jax.lax.scan(body, x, ks)
    return out


def batch_inverse(x: jax.Array, axis: int = -1, mul_fn=None) -> jax.Array:
    """Invert every element along ``axis`` via the blocked Montgomery trick:
    ~4 multiplies per element plus ONE Fermat inversion.

    The axis is viewed as (B, L) blocks.  A forward ``lax.scan`` over the L
    positions builds within-block inclusive prefix products (n multiplies);
    the B block totals get exclusive prefix/suffix products with the
    log-step scan (B·log B ≪ n) and one Fermat-inverted grand total, giving
    C[b] = inv(block_prod[b]) with multiplications only; a backward scan
    then emits inv(x[b, t]) = C[b] · prefix_excl[b, t] · suffix_excl[b, t]
    (2n multiplies).  The previous two full Hillis-Steele scans cost
    2·log₂n ≈ 46 multiplies per element at the 2^22 open — this is ~11×
    less arithmetic (round-4 VERDICT weak #1's 554 ms barycentric program
    was mostly this inversion).

    Replaces the reference's per-row extended-Euclid inversions
    (trace/src/permutation.rs:70, trace/src/lookup.rs:126).  All inputs
    must be nonzero (matching the reference's panic-on-zero semantics).

    ``mul_fn`` overrides the field multiply used for the O(n) sweeps (the
    TPU path injects the Pallas elementwise kernel — the XLA limb multiply
    executes memory-bound there); the single Fermat inversion always runs
    through the plain path (a ~500-multiply chain on one element).
    """
    axis = axis % x.ndim
    assert axis != 0, "axis 0 is the limb axis"
    if axis != x.ndim - 1:
        xm = jnp.moveaxis(x, axis, -1)
        return jnp.moveaxis(batch_inverse(xm, -1, mul_fn), -1, axis)

    if mul_fn is None:
        mul_fn = mul
    n = x.shape[-1]
    if n <= 128:
        # small: two log-step scans are cheap and avoid scan overhead
        prefix_inc = prefix_scan(x, "mul")
        suffix_inc = prefix_scan(x, "mul", reverse=True)
        one_block = ones(x.shape[1:-1] + (1,))

        def exc(arr, rev):
            body = arr[..., 1:] if rev else arr[..., : n - 1]
            parts = (body, one_block) if rev else (one_block, body)
            return jnp.concatenate(parts, axis=-1)

        total = prefix_inc[..., n - 1 :]
        return mul(mul(exc(prefix_inc, False), exc(suffix_inc, True)), inv(total))

    l_len = 64
    while n % l_len:
        l_len //= 2
    b = n // l_len
    batch = x.shape[1:-1]
    xb = x.reshape((NUM_LIMBS,) + batch + (b, l_len))
    # scan axis leading: (L, 16, *batch, B)
    xs = jnp.moveaxis(xb, -1, 0)

    def fwd(carry, xt):
        p = mul_fn(carry, xt)
        return p, p

    one_b = ones(batch + (b,))
    block_prod, prefix_inc = jax.lax.scan(fwd, one_b, xs)
    # block-level exclusive prefix/suffix over B (log B steps, tiny)
    bp_inc = prefix_scan(block_prod, "mul", combine=mul_fn)
    bs_inc = prefix_scan(block_prod, "mul", reverse=True, combine=mul_fn)
    one1 = ones(batch + (1,))
    bp_exc = jnp.concatenate([one1, bp_inc[..., : b - 1]], axis=-1)
    bs_exc = jnp.concatenate([bs_inc[..., 1:], one1], axis=-1)
    inv_total = inv(bp_inc[..., b - 1 :])  # one Fermat chain
    c_blk = mul_fn(
        mul_fn(bp_exc, bs_exc), jnp.broadcast_to(inv_total, bp_exc.shape)
    )  # inv(block_prod[b])

    # backward: inv(x[t]) = C · prefix_incl[t-1] · suffix_excl[t]
    pe = jnp.concatenate(
        [one_b[None], prefix_inc[: l_len - 1]], axis=0
    )  # exclusive within-block prefixes, scan-major

    def bwd(carry, inp):
        pe_t, x_t = inp
        out = mul_fn(mul_fn(carry, pe_t), c_blk)
        return mul_fn(carry, x_t), out

    _, ys = jax.lax.scan(bwd, one_b, (pe, xs), reverse=True)
    out = jnp.moveaxis(ys, 0, -1)  # (16, *batch, B, L)
    return out.reshape(x.shape)
