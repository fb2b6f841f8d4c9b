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
        )  # w^{dev·n2loc}·w^{j} = w^{global i2}
        # T[k1, j] = (w^{i2})^{k1} by ONE binary-exponent scan (2 multiply
        # graphs instead of log2(n1) doubling graphs — compile leanness).
        k1 = jnp.arange(n1, dtype=jnp.int32)[:, None]

        def pow_body(carry, t_):
            res, base = carry
            bit = ((k1 >> t_) & 1) != 0
            return (jnp.where(bit, fr.mul(res, base), res), fr.mul(base, base)), None

        steps = max((n1 - 1).bit_length(), 0)
        (t, _), _ = jax.lax.scan(
            pow_body,
            (fr.ones((n1, n2loc)), row1[:, None, :]),
            jnp.arange(steps, dtype=jnp.int32),
        )  # (16, n1, n2loc): T[k1, j]
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

    def subtree_root(dig):
        """Root of a (16, m) digest layer via ONE fixed-shape scan: each step
        compresses the (halving) valid prefix in place — one compiled
        compression body for all log2(m) levels."""
        m = dig.shape[-1]
        if m == 1:
            return dig

        def body(buf, _):
            nxt = p2.compress(buf[..., 0::2], buf[..., 1::2], params)
            return jnp.concatenate([nxt, jnp.zeros_like(nxt)], axis=-1), None

        buf, _ = jax.lax.scan(body, dig, None, length=m.bit_length() - 1)
        return buf[..., :1]

    def local_fn(ml):
        dig = p2.hash_columns([ml[:, i] for i in range(w)], params)
        sub = subtree_root(dig)  # (16, 1)
        roots = jax.lax.all_gather(sub, ROWS_AXIS, axis=-1, tiled=True)  # (16, D)
        return subtree_root(roots)[..., 0]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, ROWS_AXIS),),
        out_specs=P(),
        check_rep=False,
    )
    return fn(matrix)


def sharded_leaf_digests(
    matrix: jax.Array,
    mesh: Mesh,
    params: p2.Poseidon2Params = p2.DEFAULT_PARAMS,
) -> jax.Array:
    """Leaf row-hash sweep of a (16, W, N) row-sharded matrix -> (16, N)
    digest layer, still row-sharded (pure local work, no communication)."""
    w = matrix.shape[1]

    def local_fn(ml):
        return p2.hash_columns([ml[:, i] for i in range(w)], params)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, ROWS_AXIS),),
        out_specs=P(None, ROWS_AXIS),
        check_rep=False,
    )
    return fn(matrix)


def sharded_levels_from_digests(
    dig: jax.Array,
    mesh: Mesh,
    params: p2.Poseidon2Params = p2.DEFAULT_PARAMS,
) -> list:
    """All upper Merkle levels above a (16, N) row-sharded digest layer.

    Levels up to log2(N/D) are built locally (a contiguous leaf block's
    subtree digests are a contiguous block of every level — concatenating the
    local levels IS the global level, so the out_specs row-shard them with no
    communication).  The top log2(D) levels are computed replicated from the
    all-gathered (16, D) subtree-root layer.  Returns [level1, ..., root].
    """
    n = dig.shape[-1]
    d = _axis_size(mesh)
    nloc = n // d

    from ..merkle.mmcs import _scan_tree_levels

    class _H:
        @staticmethod
        def compress(a, b):
            return p2.compress(a, b, params)

    def local_fn(dl):
        if nloc >= 4:
            ups = _scan_tree_levels(dl, _H)  # one compiled compress body
        else:
            ups, s = [], nloc
            cur = dl
            while s > 1:
                cur = p2.compress(cur[..., 0::2], cur[..., 1::2], params)
                ups.append(cur)
                s //= 2
        return tuple(ups)

    log_local = nloc.bit_length() - 1
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, ROWS_AXIS),),
        out_specs=tuple(P(None, ROWS_AXIS) for _ in range(log_local)),
        check_rep=False,
    )
    levels = list(fn(dig)) if log_local else []
    # top levels: replicated compress sweeps of the (16, D) root layer
    top = levels[-1] if levels else dig
    size = d
    if size >= 4:
        levels.extend(_scan_tree_levels(top, _H))
    else:
        while size > 1:
            top = p2.compress(top[..., 0::2], top[..., 1::2], params)
            levels.append(top)
            size //= 2
    return levels


def sharded_tree_levels(
    matrix: jax.Array,
    mesh: Mesh,
    params: p2.Poseidon2Params = p2.DEFAULT_PARAMS,
) -> list:
    """Every Merkle digest level of a (16, W, N) row-sharded matrix:
    local leaf hashing + :func:`sharded_levels_from_digests` — the sharded
    analog of ``mmcs.commit`` that retains everything query opening needs
    (round-1 gap: ``sharded_merkle_root`` returned only the root, so no
    sharded openings were possible).  [0] = leaf digests ... [-1] = root."""
    dig = sharded_leaf_digests(matrix, mesh, params)
    return [dig] + sharded_levels_from_digests(dig, mesh, params)


def sharded_commit(matrix: jax.Array, mesh: Mesh, hasher=None):
    """Full sharded MMCS commitment of one (16, W, N) row-sharded matrix."""
    from ..hash.hasher import Poseidon2Hasher, make_hasher
    from ..merkle.mmcs import MerkleTree

    h = make_hasher(hasher if hasher is not None else p2.DEFAULT_PARAMS)
    params = h.params if isinstance(h, Poseidon2Hasher) else p2.DEFAULT_PARAMS
    levels = sharded_tree_levels(matrix, mesh, params)
    return MerkleTree([matrix], [0], levels, h, None)


def sharded_fold(
    f: jax.Array,
    beta,
    shift_int: int,
    omega_int: int,
    mesh: Mesh,
) -> jax.Array:
    """One FRI fold of (16, N) -> (16, N/2), both contiguously row-sharded.

    ``beta`` is a host int (structural dryrun) or a (16,) Montgomery device
    scalar (the real prover — a host int would be baked into the jit cache
    as a per-proof constant).

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

    beta_is_arr = not isinstance(beta, int)

    def local_fn(fl, *beta_arg):
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
        if beta_is_arr:
            scaled = fr.mul(
                diff, jnp.broadcast_to(beta_arg[0][:, None], diff.shape)
            )
        else:
            scaled = fr.mul_const(diff, beta)
        return fr.add(s, scaled)

    in_specs = [P(None, ROWS_AXIS)]
    args = [f]
    if beta_is_arr:
        in_specs.append(P(None))
        args.append(beta)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, ROWS_AXIS),
        check_rep=False,
    )
    return fn(*args)
