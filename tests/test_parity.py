"""Reference-parity vectors (PARITY.md §1) — host-only, no device ops."""

import random

from linea_stark_tpu.field import oracle
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.hash import poseidon2 as p2
from linea_stark_tpu.utils import cbor

rng = random.Random(41)


def test_from_be_bytes_mod_order_reduces():
    """BE decode is mod-order reduction, not canonical rejection
    (trace/src/permutation.rs:102, trace/src/lookup.rs:266)."""
    over = R_MOD + 12345
    data = over.to_bytes(32, "big")
    assert oracle.from_be_bytes_mod_order(data) == 12345
    assert oracle.from_be_bytes_mod_order(b"\x00" * 32) == 0
    v = rng.randrange(R_MOD)
    assert oracle.from_be_bytes_mod_order(v.to_bytes(32, "big")) == v


def test_compress_equals_truncated_permutation():
    """The commented compress alternative TruncatedPermutation<Perm,2,1,3>
    (bin/src/config.rs:18) equals the default
    CompressionFunctionFromHasher<PaddingFreeSponge> for width 3 / rate 2 /
    out 1: both are permute([a, b, 0])[0]."""
    for _ in range(4):
        a, b = rng.randrange(R_MOD), rng.randrange(R_MOD)
        truncated = p2.permute_ints([a, b, 0])[0]
        assert p2.compress_ints(a, b) == truncated
        assert p2.hash_ints([a, b]) == truncated


def test_sponge_overwrite_absorb_semantics():
    """PaddingFreeSponge overwrite-absorbs rate-2 chunks, permuting after
    every chunk including a final partial one (bin/src/config.rs:12)."""
    vals = [rng.randrange(R_MOD) for _ in range(5)]
    state = [0, 0, 0]
    for i in range(0, 4, 2):
        state[0], state[1] = vals[i], vals[i + 1]
        state = p2.permute_ints(state)
    state[0] = vals[4]  # partial chunk overwrites only the first slot
    state = p2.permute_ints(state)
    assert p2.hash_ints(vals) == state[0]
    assert p2.hash_ints([]) == 0  # zero-length input: never permuted


def test_cbor_bignum_round_trip():
    """Proof serialization carries 253-bit field elements (CBOR tag 2/3)."""
    vals = [R_MOD - 1, rng.randrange(R_MOD), 2**64, 2**64 - 1, 0,
            -(2**70), {"k": [R_MOD - 2]}]
    for v in vals:
        assert cbor.loads(cbor.dumps(v)) == v
