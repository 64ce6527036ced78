// Scalar 128-bit prime-field arithmetic for M = 2^128 - 45*2^40 + 1.
//
// Host-side native core used by the VM interpreter (trace generation) and
// the batch hashing helpers.  Uses GCC/Clang __uint128_t; multiplication
// reduces through R = 2^128 mod M = 45*2^40 - 1 (same folding identity the
// device kernels use; algorithm written for 64-bit limbs).

#pragma once
#include <cstdint>

namespace f128 {

using u64 = uint64_t;
using u128 = unsigned __int128;

// M = 2^128 - 45*2^40 + 1
constexpr u128 M = ((u128)0xFFFFFFFFFFFFFFFFULL << 64) | 0xFFFFD30000000001ULL;
// R = 2^128 mod M = 45*2^40 - 1
constexpr u128 R = ((u128)45 << 40) - 1;

inline u128 add(u128 a, u128 b) {
    // a + b may overflow 128 bits; use the complement trick
    u128 z = M - b;
    return (a < z) ? (M - z + a) : (a - z);
}

inline u128 sub(u128 a, u128 b) { return (a < b) ? (M - b + a) : (a - b); }

inline u128 neg(u128 a) { return a == 0 ? 0 : M - a; }

// 128x128 -> 256 multiply, then fold the high half twice through R.
inline u128 mul(u128 a, u128 b) {
    u64 a0 = (u64)a, a1 = (u64)(a >> 64);
    u64 b0 = (u64)b, b1 = (u64)(b >> 64);

    u128 ll = (u128)a0 * b0;
    u128 lh = (u128)a0 * b1;
    u128 hl = (u128)a1 * b0;
    u128 hh = (u128)a1 * b1;

    // mid = lh + hl (may carry into bit 129)
    u128 mid = lh + hl;
    u128 carry_mid = (mid < lh) ? ((u128)1 << 64) : 0;

    u128 lo = ll + (mid << 64);
    u128 carry_lo = (lo < ll) ? 1 : 0;
    u128 hi = hh + (mid >> 64) + carry_mid + carry_lo;

    // first fold: hi*R + lo; hi*R < 2^173.5 so compute in parts
    // hi*R = hi*45*2^40 - hi
    // do it as 256-bit again via the same split (R < 2^46)
    u64 r_lo = (u64)R, r_hi = (u64)(R >> 64);  // r_hi == 0
    (void)r_hi;
    u64 h0 = (u64)hi, h1 = (u64)(hi >> 64);
    u128 p_ll = (u128)h0 * r_lo;
    u128 p_hl = (u128)h1 * r_lo;         // < 2^110
    u128 fold_lo = p_ll + (p_hl << 64);
    u128 carry1 = (fold_lo < p_ll) ? 1 : 0;
    u128 fold_hi = (p_hl >> 64) + carry1;

    u128 acc_lo = fold_lo + lo;
    u128 carry2 = (acc_lo < fold_lo) ? 1 : 0;
    u128 acc_hi = fold_hi + carry2;      // < 2^47

    // second fold: acc_hi * R + acc_lo
    u128 fold2 = acc_hi * R;             // < 2^93, no overflow
    u128 res = acc_lo + fold2;
    if (res < acc_lo) {
        // wrapped past 2^128: subtract 2^128 happened implicitly; add R
        res += R;
    }
    if (res >= M) res -= M;
    return res;
}

inline u128 exp(u128 base, u128 e) {
    if (base == 0) return 0;
    u128 r = 1;
    while (e > 0) {
        if (e & 1) r = mul(r, base);
        e >>= 1;
        base = mul(base, base);
    }
    return r;
}

inline u128 inv(u128 x) {
    // Fermat: x^(M-2)
    if (x == 0) return 0;
    return exp(x, M - 2);
}

}  // namespace f128
