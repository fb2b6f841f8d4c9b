"""linea_stark_tpu — a TPU-native STARK proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``distributed-lab/linea-stark-prover`` (Plonky3 uni-stark + two-adic FRI over
BLS12-377 Fr): field limb kernels, NTT/LDE, Poseidon2 Merkle commitments,
AIR constraint gadgets (grand-product permutation, LogUp lookup), FRI PCS,
and a prove/verify driver — sharded over TPU meshes with JAX collectives.

Layer map (bottom-up, mirrors SURVEY.md §7):
    field/       Fr limb arithmetic (Montgomery, 16x16-bit limbs in uint32)
    ntt/         radix-2 NTT, coset LDE, distributed four-step variant
    hash/        Poseidon2 width-3 permutation, sponge, compression
    merkle/      batch-matrix Merkle commitments (MMCS)
    challenger/  host-side hash challenger (Fiat-Shamir transcript)
    fri/         FRI commit/fold/query + proof-of-work grind
    pcs/         two-adic FRI polynomial commitment scheme
    air/         AIR gadget API (vectorized LDE eval + scalar verifier eval)
    trace/       CBOR loaders and device-resident trace column builders
    prover/      uni-stark prove/verify orchestration, proof serialization
    dist/        mesh setup and sharded kernels
    utils/       bit tricks, span-tree timing
"""

__version__ = "0.1.0"
