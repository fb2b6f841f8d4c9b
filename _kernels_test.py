import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np
import jax.numpy as jnp
from linea_stark_tpu.field import fr, oracle
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu import fr_ops as fo
from linea_stark_tpu.kernels import pallas_field as pf

rng = np.random.default_rng(2)
n = 1 << 15
vals = [(int.from_bytes(rng.bytes(31), "big") % R_MOD) or 1 for _ in range(n)]
x = jnp.asarray(fr.pack_ints(vals))

t0 = time.time()
pre = pf.scan(x, "mul", False)
pre.block_until_ready()
print("scan mul fwd compile+run:", time.time() - t0)
t0 = time.time()
suf = pf.scan(x, "mul", True)
suf.block_until_ready()
print("scan mul rev compile+run:", time.time() - t0)
t0 = time.time()
ssum = pf.scan(x, "add", False)
ssum.block_until_ready()
print("scan add compile+run:", time.time() - t0)

# oracle check on a sample of positions
got_pre = fr.unpack_ints(np.asarray(pre))
got_suf = fr.unpack_ints(np.asarray(suf))
got_sum = fr.unpack_ints(np.asarray(ssum))
acc = 1
ok = True
import random
checks = [0, 1, 8191, 8192, 8193, n - 1] + [random.randrange(n) for _ in range(20)]
pp = []
accp = 1
sacc = 0
pres, sums = [], []
for v in vals:
    accp = accp * v % R_MOD
    sacc = (sacc + v) % R_MOD
    pres.append(accp)
    sums.append(sacc)
sufs = [0] * n
acc2 = 1
for i in range(n - 1, -1, -1):
    acc2 = acc2 * vals[i] % R_MOD
    sufs[i] = acc2
for i in checks:
    if got_pre[i] != pres[i]: print("PRE MISMATCH", i); ok = False
    if got_suf[i] != sufs[i]: print("SUF MISMATCH", i); ok = False
    if got_sum[i] != sums[i]: print("SUM MISMATCH", i); ok = False
print("scan correctness:", ok)

# batch_inverse end-to-end
t0 = time.time()
inv = fo.batch_inverse(x)
inv.block_until_ready()
print("batch_inverse:", time.time() - t0)
got_inv = fr.unpack_ints(np.asarray(inv))
ok2 = all(got_inv[i] == pow(vals[i], R_MOD - 2, R_MOD) for i in checks)
print("batch_inverse correctness:", ok2)

# steady-state timing at 2^22
big_vals = np.asarray(x)
big = jnp.asarray(np.tile(big_vals, (1, 1 << 7)))
t0 = time.time(); r = pf.scan(big, "mul", False); r.block_until_ready()
print("scan 2^22 compile+run:", time.time() - t0)
t0 = time.time()
for _ in range(3): r = pf.scan(big, "mul", False)
r.block_until_ready()
print("scan 2^22 steady:", (time.time() - t0) / 3)

# ---- tree_levels_br vs compress sweeps ----
from linea_stark_tpu.hash.hasher import Poseidon2Hasher
from linea_stark_tpu.kernels import pallas_poseidon2 as pk
from linea_stark_tpu.merkle.mmcs import _bitrev_table

h = Poseidon2Hasher()
rng = np.random.default_rng(1)
d = rng.integers(0, 1 << 16, size=(16, 1 << 15), dtype=np.uint32)
d[15] = 0
d = jnp.asarray(d)
T = 1 << 15
br = _bitrev_table(T)
d_br = jnp.take(d, jnp.asarray(br), axis=-1)

t0 = time.time()
ups = pk.tree_levels_br(d_br, h.params)
ups[0].block_until_ready()
print("tree_levels_br compile+run:", time.time() - t0)

cur = d
ok = True
for l, u in enumerate(ups):
    cur = h.compress(cur[..., 0::2], cur[..., 1::2])
    w = cur.shape[-1]
    brl = _bitrev_table(w)
    nat = np.asarray(u)[:, np.argsort(brl)] if False else np.asarray(u)[:, brl]  # u[_, brl[s]] = natural s
    same = bool((np.asarray(cur) == nat).all())
    ok = ok and same
    if not same:
        print("TREE MISMATCH at level", l + 1)
        break
print("tree levels match:", ok)

t0 = time.time()
for _ in range(5):
    ups = pk.tree_levels_br(d_br, h.params)
ups[-1].block_until_ready()
print("tree steady per call:", (time.time() - t0) / 5)
