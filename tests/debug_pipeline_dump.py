"""Debug helper: compute prover intermediates with fixed challenges and dump
to an npz so the Pallas (TPU) and XLA (CPU) paths can be diffed stage by
stage.  Usage: python tests/debug_pipeline_dump.py OUT.npz
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

if __name__ == "__main__":
    out_path = sys.argv[1]
    if "cpu" in out_path:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        "/root/repo/.jax_cache_tpu" if "cpu" not in out_path else "/root/repo/.jax_cache",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from linea_stark_tpu import fr_ops as fo
    from linea_stark_tpu.field import fr
    from linea_stark_tpu.field.constants import COSET_SHIFT, R_MOD
    from linea_stark_tpu.fri.fold import fold_codeword
    from linea_stark_tpu.ntt import coset_lde, root_of_unity
    from linea_stark_tpu.config import FriConfig
    from linea_stark_tpu.hash.hasher import Poseidon2Hasher
    from linea_stark_tpu.pcs.two_adic_fri import TwoAdicFriPcs
    from linea_stark_tpu.prover.uni_stark import compute_quotient
    from linea_stark_tpu.trace import build_trace, gen_permutation_trace

    NUM_LIMBS = 16
    alpha, delta, gamma, zeta, alpha_p = 11111, 22222, 33333, 44444, 55555
    beta0, beta1 = 66666, 77777
    log_n, log_blowup = 10, 3
    n = 1 << log_n
    n_lde = n << log_blowup
    shift = COSET_SHIFT
    omega_lde = root_of_unity(log_n + log_blowup)
    omega_n = root_of_unity(log_n)

    raw = gen_permutation_trace(3, n, seed=7)
    built = build_trace([raw], [], alpha, delta, check=False)
    trace = built.matrix

    pcs = TwoAdicFriPcs(
        fri=FriConfig(log_blowup=log_blowup), hasher=Poseidon2Hasher(),
        shift=shift,
    )
    trace_lde = coset_lde(trace, log_blowup, shift)
    q = compute_quotient(
        trace_lde, built.air, alpha, delta, gamma, n, shift, n_chunks=8
    )  # (16, 8, n) coset-major
    chunk_stack = pcs._chunk_ldes_batched(q, omega_lde)

    x_vec = fo.mul_const(fo.powers(omega_lde, n_lde), shift)
    zeta_v = fr.full((n_lde,), zeta)
    denom_inv = fo.batch_inverse(fo.sub(zeta_v, x_vec))
    opened = pcs._barycentric_open(trace_lde, zeta, denom_inv, x_vec)

    # reduced codeword with one point for simplicity
    f0 = fr.zeros((n_lde,))
    k = 1
    num = fr.zeros((n_lde,))
    for c in range(trace.shape[1]):
        col = fo.sub(trace_lde[:, c], fr.full((n_lde,), opened[c]))
        num = fo.add(num, fo.mul_const(col, k))
        k = (k * alpha_p) % R_MOD
    f0 = fo.add(f0, fo.mul(num, denom_inv))

    f1 = fold_codeword(f0, beta0, shift, omega_lde)
    f2 = fold_codeword(
        f1, beta1, (shift * shift) % R_MOD, (omega_lde * omega_lde) % R_MOD
    )

    np.savez(
        out_path,
        trace=np.asarray(trace),
        trace_lde=np.asarray(trace_lde),
        q=np.asarray(q),
        chunk_stack=np.asarray(chunk_stack),
        opened=np.asarray(np.array([v for v in opened], dtype=object), allow_pickle=True) if False else np.array([str(v) for v in opened]),
        f0=np.asarray(f0),
        f1=np.asarray(f1),
        f2=np.asarray(f2),
    )
    print("dumped", out_path)
