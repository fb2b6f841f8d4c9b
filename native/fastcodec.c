/* Fast trace-value codec: 32-byte big-endian scalars -> Fr Montgomery limbs.
 *
 * Host-side hot loop of trace loading (the reference decodes every value
 * with ark-ff's from_be_bytes_mod_order in Rust —
 * trace/src/permutation.rs:102, trace/src/lookup.rs:266).  zkevm-scale trace
 * files hold millions of scalars; the pure-Python decoder is ~10k values/s,
 * this one is ~10M/s.
 *
 * Arithmetic: 4x64-bit limbs with __uint128_t products; CIOS Montgomery
 * multiply for the R^2 conversion.  Constants generated into
 * fastcodec_constants.h by build.py from the canonical Python values.
 *
 * Output layout matches the device representation: uint32[16][n] (16-bit
 * limb planes, little-endian limb order).
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

#include "fastcodec_constants.h"

typedef __uint128_t u128;
typedef uint64_t u64;
typedef uint32_t u32;
typedef uint8_t u8;

static const u64 R_LIMBS[4] = {R64_0, R64_1, R64_2, R64_3};
static const u64 R2_LIMBS[4] = {R2_0, R2_1, R2_2, R2_3};
static const u64 N0_INV = N0INV64; /* -r^{-1} mod 2^64 */

static int geq(const u64 a[4], const u64 b[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return 0;
    }
    return 1;
}

static void sub_r(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - R_LIMBS[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

/* out = a*b*R^{-1} mod r (CIOS, 4x64) */
static void mont_mul(const u64 a[4], const u64 b[4], u64 out[4]) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a[i] * b[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * N0_INV;
        carry = ((u128)t[0] + (u128)m * R_LIMBS[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 c2 = (u128)t[j] + (u128)m * R_LIMBS[j] + carry;
            t[j - 1] = (u64)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    u64 res[4] = {t[0], t[1], t[2], t[3]};
    if (t[4] || geq(res, R_LIMBS)) sub_r(res);
    out[0] = res[0]; out[1] = res[1]; out[2] = res[2]; out[3] = res[3];
}

/* big-endian 32 bytes -> value mod r (canonical 4x64 LE limbs) */
static void decode_one(const u8 *in, u64 v[4]) {
    for (int w = 0; w < 4; w++) {
        u64 x = 0;
        for (int b = 0; b < 8; b++) x = (x << 8) | in[(3 - w) * 8 + b];
        v[w] = x;
    }
    /* value < 2^256 < 16r: subtract shifted r */
    for (int k = 3; k >= 0; k--) {
        u64 rs[4] = {0, 0, 0, 0};
        /* rs = r << (k bits) -- r < 2^253 so r<<3 fits 256 bits */
        int bits = k;
        u64 carry = 0;
        for (int i = 0; i < 4; i++) {
            u64 x = R_LIMBS[i];
            rs[i] = (x << bits) | carry;
            carry = bits ? (x >> (64 - bits)) : 0;
        }
        while (geq(v, rs)) {
            u128 borrow = 0;
            for (int i = 0; i < 4; i++) {
                u128 d = (u128)v[i] - rs[i] - borrow;
                v[i] = (u64)d;
                borrow = (d >> 64) ? 1 : 0;
            }
        }
    }
}

/* n scalars of 32 BE bytes -> uint32[16][n] Montgomery 16-bit limb planes */
void fr_decode_be_mod_order_mont(const u8 *in, u32 *out, size_t n, int to_mont) {
    for (size_t k = 0; k < n; k++) {
        u64 v[4];
        decode_one(in + 32 * k, v);
        u64 m[4];
        if (to_mont) {
            mont_mul(v, R2_LIMBS, m);
        } else {
            memcpy(m, v, sizeof(m));
        }
        for (int i = 0; i < 16; i++) {
            out[(size_t)i * n + k] = (u32)((m[i / 4] >> (16 * (i % 4))) & 0xFFFF);
        }
    }
}

/* uint32[16][n] limb planes (Montgomery or canonical) -> 32-byte BE scalars */
void fr_encode_be(const u32 *in, u8 *out, size_t n, int from_mont) {
    for (size_t k = 0; k < n; k++) {
        u64 v[4] = {0, 0, 0, 0};
        for (int i = 0; i < 16; i++) {
            v[i / 4] |= ((u64)(in[(size_t)i * n + k] & 0xFFFF)) << (16 * (i % 4));
        }
        if (from_mont) {
            u64 one[4] = {1, 0, 0, 0};
            u64 t[4];
            mont_mul(v, one, t);
            memcpy(v, t, sizeof(v));
        }
        for (int w = 0; w < 4; w++) {
            for (int b = 0; b < 8; b++) {
                out[32 * k + (3 - w) * 8 + (7 - b)] = (u8)((v[w] >> (8 * b)) & 0xFF);
            }
        }
    }
}
