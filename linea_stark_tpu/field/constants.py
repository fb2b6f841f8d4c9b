"""BLS12-377 scalar-field (Fr) constants.

The reference prover works over ``Bls12_377Fr`` — the 253-bit scalar field of
BLS12-377 — wrapped from ark-ff (reference: ``bin/src/config.rs:9``,
``Cargo.lock:512-526``).  This module holds the protocol constants and the
limb-decomposition parameters used by the TPU kernels.

Limb representation
-------------------
A field element is stored as 16 little-endian limbs of 16 bits each, held in
``uint32`` lanes (products of two limbs fit exactly in 32 bits, so the TPU VPU
— which has no widening integer multiply — computes exact partial products).
Arithmetic is Montgomery form with R = 2**256.

Because r ≡ 1 (mod 2**47), the Montgomery constant  -r^{-1} mod 2**16  is
0xFFFF, i.e. the per-step quotient digit is simply  (-acc) mod 2**16.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Prime modulus (253 bits, two-adicity 47).
# ---------------------------------------------------------------------------
R_MOD = 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001
MODULUS = R_MOD  # alias
MODULUS_BITS = 253
TWO_ADICITY = 47

# Montgomery parameters (R = 2**256).
LIMB_BITS = 16
NUM_LIMBS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
MONT_R = (1 << 256) % R_MOD
MONT_R2 = (MONT_R * MONT_R) % R_MOD
# -r^{-1} mod 2**16 == 0xFFFF (r ≡ 1 mod 2**16)
MONT_N0 = pow(-R_MOD, -1, 1 << LIMB_BITS)
assert MONT_N0 == LIMB_MASK

# ---------------------------------------------------------------------------
# Two-adic root of unity: the smallest c >= 2 such that c**((r-1)/2**47) has
# exact order 2**47 is c = 11; the resulting root generates every power-of-two
# subgroup up to 2**47 (plenty for traces up to 2**22 rows at blowup 8, the
# sizes profiled in the reference bench.log:20).
# ---------------------------------------------------------------------------
TWO_ADIC_GENERATOR = pow(11, (R_MOD - 1) >> TWO_ADICITY, R_MOD)

# Coset shift for low-degree extensions.  ark-bls12-377 documents 22 as the
# multiplicative-group generator of Fr; for LDE correctness all we require is
# that the shift is outside every 2**k subgroup (so the coset g·H is disjoint
# from H), which holds iff shift**(2**47) != 1 — asserted below.
COSET_SHIFT = 22
assert pow(COSET_SHIFT, 1 << TWO_ADICITY, R_MOD) != 1

# S-box exponent for Poseidon2: the smallest alpha with gcd(alpha, r-1) = 1.
# 3, 5, 7 and 13 all divide r-1, so x^alpha is a permutation first at 11.
POSEIDON2_ALPHA = 11


def to_limbs(x: int) -> np.ndarray:
    """Decompose an integer (< 2**256) into 16 LE 16-bit limbs (uint32)."""
    return np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(NUM_LIMBS)],
        dtype=np.uint32,
    )


def from_limbs(limbs) -> int:
    """Recompose an integer from LE 16-bit limbs."""
    out = 0
    for i, limb in enumerate(np.asarray(limbs).tolist()):
        out |= int(limb) << (LIMB_BITS * i)
    return out


# Precomputed limb vectors used by kernels.
MODULUS_LIMBS = to_limbs(R_MOD)
MONT_R_LIMBS = to_limbs(MONT_R)
MONT_R2_LIMBS = to_limbs(MONT_R2)
ZERO_LIMBS = to_limbs(0)
# The Montgomery representation of 1 is R mod r.
ONE_MONT_LIMBS = to_limbs(MONT_R)
