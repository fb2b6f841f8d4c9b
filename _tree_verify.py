import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np
import jax.numpy as jnp
from linea_stark_tpu.field import fr
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.hash import poseidon2 as p2
from linea_stark_tpu.hash.hasher import Poseidon2Hasher
from linea_stark_tpu.kernels import pallas_poseidon2 as pk
from linea_stark_tpu.merkle import mmcs

h = Poseidon2Hasher()
T = 1 << 15
rng = np.random.default_rng(3)
vals = [int.from_bytes(rng.bytes(31), "big") % R_MOD for i in range(T)]
d = jnp.asarray(fr.pack_ints(vals))
br = mmcs._bitrev_table(T)
d_br = jnp.take(d, jnp.asarray(br), axis=-1)

t0 = time.time()
ups = pk.tree_levels_br(d_br, h.params)
ups[-1].block_until_ready()
print("tree_levels_br run:", time.time() - t0)

# host oracle: full natural tree
level = list(vals)
ok = True
t0 = time.time()
for l, u in enumerate(ups):
    level = [p2.compress_ints(level[2 * i], level[2 * i + 1]) for i in range(len(level) // 2)]
    w = u.shape[-1]
    got = fr.unpack_ints(np.asarray(u))
    brl = mmcs._bitrev_table(w)
    nat = [got[brl[s]] for s in range(w)]
    if nat != level:
        print("TREE MISMATCH at level", l + 1)
        ok = False
        break
print("tree levels match:", ok, f"({time.time()-t0:.1f}s host oracle)")

t0 = time.time()
for _ in range(5):
    ups = pk.tree_levels_br(d_br, h.params)
ups[-1].block_until_ready()
print("tree steady per call:", (time.time() - t0) / 5)

# end-to-end mmcs with the kernel path at a real height
hgt, w = 1 << 10, 2
mvals = [int.from_bytes(rng.bytes(31), "big") % R_MOD for _ in range(w * hgt)]
m = jnp.asarray(fr.pack_ints(mvals)).reshape(16, w, hgt)
t0 = time.time()
tree = mmcs.commit([m], h)
root = tree.root_int()
print("commit 2^10 (pallas, tree kernel):", time.time() - t0, "br_start:", tree.br_start)
ops = mmcs.open_at(tree, [0, 1, 511, 512, 1023])
assert all(mmcs.verify_opening(root, [(hgt, w)], op, h) for op in ops)
print("open/verify ok")

# host recompute of the root
cols = [mvals[:hgt], mvals[hgt:]]
dig = [p2.hash_ints([cols[0][i], cols[1][i]]) for i in range(hgt)]
while len(dig) > 1:
    dig = [p2.compress_ints(dig[2 * i], dig[2 * i + 1]) for i in range(len(dig) // 2)]
print("root matches host:", dig[0] == root)
