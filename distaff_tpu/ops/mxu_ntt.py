"""MXU-based leaf NTT: 128-bit field matmuls on the systolic array.

The TPU's FLOPs live in the MXU, but 128-bit modular arithmetic is scalar
VPU work under XLA - the u32 multiply chain caps the radix-2 butterfly at
~0.3 G/s.  This module moves the multiplies onto the MXU:

- A 256-point NTT is two four-step stages of 16-point DFTs (reference
  src/math/fft.rs does the same recursion radix-2):
      X[k2 + 16 k1] = sum_i1 C[k2][k1, i1] * (sum_i2 x[i1 + 16 i2] * W[i2, k2])
  with W[i2, k2] = w16^(i2 k2) and C[k2][k1, i1] = w16^(k1 i1) * w256^(i1 k2)
  - the inter-stage twiddles are absorbed into the per-column stage-B
  matrices, so there is NO elementwise twiddle multiply inside the leaf.

- Each field matmul decomposes into 8-bit limbs: with field elements
  x = sum_q x8[q] 2^(8q) and matrix entries m = sum_p m8[p] 2^(8p), the
  product digit of weight 2^(8d) is sum_{p+q=d} sum_j m8[p][i,j] x8[q][j].
  Build BIGMAT[(i,d), (j,q)] = m8[d-q][i,j]: ONE bf16 matmul
  (16*31, 256) @ (256, B) computes every output digit of every output
  element directly - the limb convolution rides the contraction.  All
  values are exact: bf16 holds 0..255 exactly, products are exact in the
  MXU's f32 accumulator, and digit sums stay < 16*16*255^2 < 2^24.

- The 31 output digits (each < 2^24) then reduce mod M on the VPU: byte
  re-accumulation, one carry sweep, a 2^256 = R^2 fold, and the shared
  _reduce_256 - ~400 VPU ops per element per stage versus ~500 for a
  SINGLE field multiply, while the leaf's 128 multiplies per element ride
  the MXU.

Bit-exact with ops/tiles._leaf_ntt_tile (tests/test_mxu_ntt.py).  Status:
an UNWIRED experiment - nothing on the prover path dispatches here (only
benchmarks.py and its test).  Measured 0.46 Gbf/s at (8192, 256) vs the
XLA path's 0.74 (DESIGN.md section 8.2): the VPU digit reduction and the
layout transposes currently eat the MXU win.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..math import field as hostfield
from ..math import field_jax as fj

M = hostfield.M
N1 = 16
N2 = 16
LEAF = N1 * N2          # 256
DIGITS = 31             # output digits of a 16x16-byte limb convolution
_R2 = (1 << 256) % M    # 2^256 mod M, < 2^91

# stage-A/B matrix cache keyed by the 256th-root integer
_MATRIX_CACHE = {}


def _limbs8(v):
    """int -> 16 uint8 limbs, little-endian."""
    return [(v >> (8 * k)) & 0xFF for k in range(16)]


def _bigmat(entries):
    """entries: (rows, cols) array of field ints -> BIGMAT
    ((rows, DIGITS), (cols, 16q)) uint8 with BIGMAT[i, d, j, q] =
    limb_{d-q}(entries[i, j])."""
    rows, cols = entries.shape
    out = np.zeros((rows, DIGITS, cols, 16), dtype=np.uint8)
    for i in range(rows):
        for j in range(cols):
            l8 = _limbs8(int(entries[i, j]))
            for q in range(16):
                for p in range(16):
                    out[i, p + q, j, q] = l8[p]
    return out.reshape(rows * DIGITS, cols * 16)


def _matrices(root256_int):
    """Stage matrices for the 256-point leaf with root w = root256_int.

    Returns (A_mat (496, 256) bf16, B_mat (16, 496, 256) bf16):
      A_mat[(k2, d), (i2, q)]      = limb_{d-q}( w16^(i2 k2) )
      B_mat[k2][(k1, d), (i1, q)]  = limb_{d-q}( w16^(k1 i1) * w^(i1 k2) )
    """
    key = int(root256_int) % M
    hit = _MATRIX_CACHE.get(key)
    if hit is not None:
        return hit
    w = key
    w16 = pow(w, N1, M)

    wa = np.zeros((N2, N2), dtype=object)       # [k2, i2]
    for k2 in range(N2):
        for i2 in range(N2):
            wa[k2, i2] = pow(w16, i2 * k2, M)
    a_mat = jnp.asarray(_bigmat(wa), dtype=jnp.bfloat16)

    b_np = np.zeros((N2, N1 * DIGITS, N1 * 16), dtype=np.uint8)
    for k2 in range(N2):
        c = np.zeros((N1, N1), dtype=object)    # [k1, i1]
        for k1 in range(N1):
            for i1 in range(N1):
                c[k1, i1] = (pow(w16, k1 * i1, M) * pow(w, i1 * k2, M)) % M
        b_np[k2] = _bigmat(c)
    b_mat = jnp.asarray(b_np, dtype=jnp.bfloat16)

    _MATRIX_CACHE[key] = (a_mat, b_mat)
    return a_mat, b_mat


def _to_bytes16(limbs4):
    """(..., 4) u32 -> (16, ...) u32 arrays holding byte values."""
    out = []
    for k in range(4):
        w = limbs4[..., k]
        for b in range(4):
            out.append((w >> (8 * b)) & jnp.uint32(0xFF))
    return jnp.stack(out)


def _reduce_digits(digits):
    """digits: (DIGITS, ...) f32, each < 2^24 -> (..., 4) u32 canonical
    field elements of sum_d digits[d] * 2^(8d)  (a ~264-bit value)."""
    d32 = digits.astype(jnp.uint32)
    zero = jnp.zeros_like(d32[0])
    # byte re-accumulation: digit d spans bytes d, d+1, d+2
    bacc = [zero] * (DIGITS + 3)
    for d in range(DIGITS):
        v = d32[d]
        bacc[d] = bacc[d] + (v & jnp.uint32(0xFF))
        bacc[d + 1] = bacc[d + 1] + ((v >> 8) & jnp.uint32(0xFF))
        bacc[d + 2] = bacc[d + 2] + (v >> 16)
    # halfword columns (each < 2^17 + 2^25, fits u32)
    n_half = (DIGITS + 3 + 1) // 2  # 17
    cols = [bacc[2 * h] + (bacc[2 * h + 1] << 8) if 2 * h + 1 < len(bacc)
            else bacc[2 * h] for h in range(n_half)]
    h, carry = fj._carry_normalize(cols, n_half)
    # fold bits >= 256: hi * 2^256 == hi * R^2 (mod M), hi < 2^32
    hi = h[16] + (carry << 16)
    hi_lo = hi & jnp.uint32(0xFFFF)
    hi_hi = hi >> 16
    r2h = [(_R2 >> (16 * k)) & 0xFFFF for k in range(6)]
    fold_cols = [hi_lo * jnp.uint32(c) for c in r2h] + [jnp.zeros_like(hi)]
    for k, c in enumerate(r2h):
        fold_cols[k + 1] = fold_cols[k + 1] + hi_hi * jnp.uint32(c)
    fold, _ = fj._carry_normalize(fold_cols, 8)
    p = fj._add_halfwords(h[:16], fold, 17)
    # one more tiny fold: bit 256 of p is at most 1
    top = p[16]
    fold2_cols = [p[k] for k in range(16)]
    for k, c in enumerate(r2h):
        fold2_cols[k] = fold2_cols[k] + top * jnp.uint32(c)
    h2, _ = fj._carry_normalize(fold2_cols, 16)
    return fj._reduce_256(h2)


@functools.partial(jax.jit, static_argnums=())
def _leaf256_impl(values, a_mat, b_mat):
    """values: (B, 256, 4) u32 -> natural-order 256-point NTT along axis 1,
    both stages as bf16 MXU matmuls with VPU digit reduction."""
    bsz = values.shape[0]

    # ---- stage A: A[b, i1, k2] = sum_i2 x[b, i1 + 16 i2] * W[i2, k2] ----
    xm = values.reshape(bsz, N2, N1, 4)                    # [b, i2, i1, 4]
    x8 = _to_bytes16(xm)                                   # (16q, b, i2, i1)
    # LHS layout (i2, q) x (b, i1):  (256, B*16)
    lhs = jnp.transpose(x8, (2, 0, 1, 3)).reshape(N2 * 16, bsz * N1)
    pa = jnp.dot(a_mat, lhs.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)       # (496, B*16)
    da = pa.reshape(N2, DIGITS, bsz, N1)                   # [k2, d, b, i1]
    a_limbs = _reduce_digits(jnp.transpose(da, (1, 2, 3, 0)))  # (b, i1, k2, 4)

    # ---- stage B: X[b, 16 k1 + k2] = sum_i1 C[k2][k1, i1] * A[b, i1, k2] --
    a8 = _to_bytes16(a_limbs)                              # (16q, b, i1, k2)
    # batched over k2: RHS (k2, (i1, q), b)
    rhs = jnp.transpose(a8, (3, 2, 0, 1)).reshape(N2, N1 * 16, bsz)
    pb = jnp.einsum("kdj,kjb->kdb", b_mat, rhs.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)    # (k2, 496, b)
    db = pb.reshape(N2, N1, DIGITS, bsz)                   # [k2, k1, d, b]
    out = _reduce_digits(jnp.transpose(db, (2, 3, 1, 0)))  # (b, k1, k2, 4)
    return out.reshape(bsz, LEAF, 4)


def leaf_ntt256(values, root256_int):
    """Drop-in for the XLA leaf path at n = 256: (B, 256, 4) batch-major
    u32 limbs -> natural-order NTT along axis 1."""
    a_mat, b_mat = _matrices(root256_int)
    return _leaf256_impl(values, a_mat, b_mat)
