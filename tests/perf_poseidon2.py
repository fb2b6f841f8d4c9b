"""Poseidon2 kernel throughput microbench (run manually on TPU).

Usage: python tests/perf_poseidon2.py [log_n]
Prints perms/s for the permute / leaf_hash / compress kernels.
Not a pytest file — perf only makes sense on the real chip.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from linea_stark_tpu.kernels import pallas_poseidon2 as pk


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    n = 1 << log_n
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    limbs[15] = 0
    a = jnp.asarray(limbs)
    b = jnp.roll(a, 1, axis=-1)
    c = jnp.roll(a, 2, axis=-1)

    w = 8
    mlimbs = rng.integers(0, 1 << 16, size=(16, w, n // 4), dtype=np.uint32)
    mlimbs[15] = 0
    m = jnp.asarray(mlimbs)

    def bench(name, fn, perms, reps=3):
        fn()[0].block_until_ready()  # compile
        t0 = time.time()
        for _ in range(reps):
            r = fn()
        jax.tree_util.tree_leaves(r)[0].block_until_ready()
        dt = (time.time() - t0) / reps
        print(f"{name}: {perms / dt / 1e6:.2f}M perms/s ({dt*1e3:.1f} ms)")

    bench("permute ", lambda: pk.permute(a, b, c), n)
    bench("compress", lambda: (pk.compress(a, b),), n)
    bench("leaf_w8 ", lambda: (pk.leaf_hash(m),), (n // 4) * ((w + 1) // 2))


if __name__ == "__main__":
    main()
