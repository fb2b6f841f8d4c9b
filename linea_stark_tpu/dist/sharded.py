"""Row-sharded NTT / Merkle / FRI-fold via shard_map + JAX collectives.

The communication patterns (SURVEY.md §5.7-5.8):

* **NTT** — three-transpose distributed four-step: all_to_all to localize the
  major index, local transform, all_to_all back, local transform, and a final
  all_to_all so the output is natural-order and contiguously sharded.  Under
  a TPU mesh every transpose rides ICI.
* **Merkle root** — each device hashes and compresses its contiguous row
  block into one subtree root; one all_gather of the D subtree roots; the
  top log2(D) levels are computed replicated (they're tiny).
* **FRI fold** — natural-order fold pairs (j, j+N/2) live on opposite mesh
  halves; four ppermutes deliver the a/b blocks to the output's devices so
  the folded codeword stays contiguously sharded over the full mesh.

Everything is pure jnp inside shard_map, so the same code runs on a CPU
host-device mesh (tests, dryrun) and a real TPU slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..field import fr
from ..field.constants import NUM_LIMBS, R_MOD
from ..hash import poseidon2 as p2
from ..ntt.ntt import _ntt_xla, _powers_device, root_of_unity
from .mesh import ROWS_AXIS


def _axis_size(mesh: Mesh) -> int:
    return mesh.devices.size


def _device_factor_table(base: int, count: int, step: int) -> jax.Array:
    """(16, count) table of base^{d·step} for device-dependent scalars."""
    return _powers_device(pow(base, step, R_MOD), count)


def sharded_ntt(x: jax.Array, mesh: Mesh, inverse: bool = False) -> jax.Array:
    """NTT along the last axis of (16, C, N), sharded P(None, None, rows).

    Natural order in/out; unscaled (callers apply 1/N for inverses).
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    c = x.shape[1]
    d = _axis_size(mesh)
    log_n1 = log_n // 2
    n1, n2 = 1 << log_n1, n >> log_n1
    assert n1 % d == 0 and n2 % d == 0, "mesh must divide both NTT factors"
    w = root_of_unity(log_n, inverse)

    n2loc = n2 // d
    dev_base = _device_factor_table(w, d, n2loc)  # w^{dev·n2loc}

    def local_fn(xl):
        # xl: (16, C, n/d) contiguous flat block = (n1/d) i1-rows × full i2.
        xl = xl.reshape(NUM_LIMBS, c, n1 // d, n2)
        ax = ROWS_AXIS
        # transpose 1: localize i1, shard i2
        v = jax.lax.all_to_all(xl, ax, split_axis=3, concat_axis=2, tiled=True)
        # v: (16, C, n1, n2loc)
        # local NTT over axis 2 (size n1): move to last axis for the local kernel
        v = jnp.swapaxes(v, 2, 3)  # (16, C, n2loc, n1)
        v = _ntt_xla(v, log_n1, inverse)
        # twiddle T[k1, i2] = w^{k1·i2} for local i2 = dev·n2loc + j
        dev = jax.lax.axis_index(ax)
        base_pow = jnp.take(dev_base, dev, axis=-1)  # (16,) w^{dev·n2loc}
        row1 = fr.mul(
            _powers_device(w, n2loc), jnp.broadcast_to(base_pow[:, None], (NUM_LIMBS, n2loc))
        )  # w^{i2} for local i2  — wait: this is w^{dev·n2loc}·w^{j} = w^{global i2} ✓
        # T rows by block doubling over k1
        t = fr.ones((1, n2loc))
        size = 1
        cur_pow = row1  # w^{i2·size}
        while size < n1:
            scaled = fr.mul(t, cur_pow[:, None, :])
            t = jnp.concatenate([t, scaled], axis=1)
            cur_pow = fr.mul(cur_pow, cur_pow)
            size *= 2
        t = t[:, :n1]  # (16, n1, n2loc): T[k1, j]
        v = fr.mul(v, jnp.swapaxes(t, 1, 2)[:, None])  # align (n2loc, n1)
        # transpose 2: shard k1, localize i2
        v = jax.lax.all_to_all(v, ax, split_axis=3, concat_axis=2, tiled=True)
        # v: (16, C, n2, n1/d) [i2 all, k1 slice]
        v = jnp.swapaxes(v, 2, 3)  # (16, C, n1/d, n2) [k1 slice, i2]
        v = _ntt_xla(v, log_n - log_n1, inverse)  # over i2 -> k2
        # output X[k2·n1 + k1] = H[k1, k2]: transpose 3 for natural contiguity
        v = jax.lax.all_to_all(v, ax, split_axis=3, concat_axis=2, tiled=True)
        # v: (16, C, n1, n2/d) [k1 all, k2 slice]
        v = jnp.swapaxes(v, 2, 3)  # (16, C, n2/d, n1) [k2 slice, k1]
        return v.reshape(NUM_LIMBS, c, (n2 // d) * n1)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, ROWS_AXIS),),
        out_specs=P(None, None, ROWS_AXIS),
        check_rep=False,
    )
    return fn(x)


def sharded_merkle_root(
    matrix: jax.Array,
    mesh: Mesh,
    params: p2.Poseidon2Params = p2.DEFAULT_PARAMS,
) -> jax.Array:
    """Merkle root of a (16, W, N) matrix, rows sharded contiguously.

    Returns the (16,) root digest, replicated.
    """
    w, n = matrix.shape[1], matrix.shape[-1]
    d = _axis_size(mesh)

    def local_fn(ml):
        dig = p2.hash_columns([ml[:, i] for i in range(w)], params)
        size = dig.shape[-1]
        while size > 1:
            dig = p2.compress(dig[..., 0::2], dig[..., 1::2], params)
            size //= 2
        roots = jax.lax.all_gather(dig, ROWS_AXIS, axis=-1, tiled=True)  # (16, D)
        size = d
        while size > 1:
            roots = p2.compress(roots[..., 0::2], roots[..., 1::2], params)
            size //= 2
        return roots[..., 0]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, ROWS_AXIS),),
        out_specs=P(),
        check_rep=False,
    )
    return fn(matrix)


def sharded_fold(
    f: jax.Array,
    beta: int,
    shift_int: int,
    omega_int: int,
    mesh: Mesh,
) -> jax.Array:
    """One FRI fold of (16, N) -> (16, N/2), both contiguously row-sharded.

    Output block o on device o needs a-values from device o//2 (half of its
    block selected by o%2) and b-values from device D/2 + o//2 — delivered
    with four ppermutes (sources multicast to their two children).
    """
    n = f.shape[-1]
    d = _axis_size(mesh)
    assert d % 2 == 0 or d == 1
    inv2 = pow(2, R_MOD - 2, R_MOD)
    inv_shift = pow(shift_int, R_MOD - 2, R_MOD)
    inv_omega = pow(omega_int, R_MOD - 2, R_MOD)
    out_block = n // 2 // d
    # (ω^{-1})^{dev·out_block} per output device
    dev_base = _device_factor_table(inv_omega, d, out_block)

    def local_fn(fl):
        ax = ROWS_AXIS
        half_d = max(d // 2, 1)
        if d == 1:
            a, b = fl[..., : n // 2], fl[..., n // 2 :]
            sel_a, sel_b = a, b
        else:
            perms0 = [(s, 2 * s) for s in range(half_d)]
            perms1 = [(s, 2 * s + 1) for s in range(half_d)]
            permsb0 = [(half_d + s, 2 * s) for s in range(half_d)]
            permsb1 = [(half_d + s, 2 * s + 1) for s in range(half_d)]
            a0 = jax.lax.ppermute(fl, ax, perms0)
            a1 = jax.lax.ppermute(fl, ax, perms1)
            b0 = jax.lax.ppermute(fl, ax, permsb0)
            b1 = jax.lax.ppermute(fl, ax, permsb1)
            dev = jax.lax.axis_index(ax)
            odd = (dev % 2).astype(jnp.bool_)
            a_blk = jnp.where(odd, a1, a0)
            b_blk = jnp.where(odd, b1, b0)
            local_n = fl.shape[-1]
            sel_a = jnp.where(odd, a_blk[..., local_n // 2 :], a_blk[..., : local_n // 2])
            sel_b = jnp.where(odd, b_blk[..., local_n // 2 :], b_blk[..., : local_n // 2])

        dev = jax.lax.axis_index(ax)
        base = jnp.take(dev_base, dev, axis=-1)  # (16,)
        invx = fr.mul(
            _powers_device(inv_omega, sel_a.shape[-1]),
            jnp.broadcast_to(base[:, None], (NUM_LIMBS, sel_a.shape[-1])),
        )
        invx = fr.mul_const(invx, (inv2 * inv_shift) % R_MOD)
        s = fr.mul_const(fr.add(sel_a, sel_b), inv2)
        diff = fr.mul(fr.sub(sel_a, sel_b), invx)
        return fr.add(s, fr.mul_const(diff, beta))

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, ROWS_AXIS),),
        out_specs=P(None, ROWS_AXIS),
        check_rep=False,
    )
    return fn(f)
