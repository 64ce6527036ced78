"""Device-side vectorized arithmetic in the 128-bit field M = 2^128 - 45*2^40 + 1.

TPU-native representation: a field element is four little-endian uint32 limbs
stored in the trailing axis of a ``jnp.uint32`` array of shape ``(..., 4)``.
TPUs have no native 64-bit integer multiply, so multiplication decomposes each
element into eight 16-bit half-words; 16x16->32-bit partial products are exact
in uint32 lanes and accumulate without overflow (column sums stay < 2^21).

Reduction exploits the modulus shape: 2^128 = R (mod M) with R = 45*2^40 - 1,
so folding the high 128 bits is one multiply-by-45, a 40-bit shift, and a
subtraction - three cheap vectorized passes (the same folding idea as the
reference's scalar mul_reduce, reference src/math/field.rs:38-73, re-derived
for 16-bit lanes).

Everything here is jit-compatible pure functions: the building blocks for the
NTT/LDE, constraint evaluation, DEEP composition, and FRI device pipelines.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as hostfield

M = hostfield.M
G = hostfield.G

_U32 = jnp.uint32
# numpy (NOT jnp): a module-level jnp scalar is a device buffer created at
# import; closures capture it and every kernel LOWERING then fetches it back
# device-to-host to embed as an MLIR constant - on the tunneled TPU that
# synchronous fetch serializes against all queued work and cost minutes per
# cold proof (measured round 3).  A numpy scalar embeds directly.
_MASK16 = np.uint32(0xFFFF)

# M as 8 halfwords (little-endian 16-bit chunks)
M_HALFWORDS = tuple((M >> (16 * k)) & 0xFFFF for k in range(8))
# R = 2^128 mod M = 45*2^40 - 1 as 3 halfwords
R_HALFWORDS = tuple(((45 * 2**40 - 1) >> (16 * k)) & 0xFFFF for k in range(3))


# ------------------------------------------------------------------------------------------------
# conversions
# ------------------------------------------------------------------------------------------------

def from_ints(values):
    """Python ints / numpy object array -> (..., 4) uint32 limb array.

    Vectorized through numpy object arithmetic (C loops over PyInt ops)."""
    arr = np.asarray(values, dtype=object)
    limbs = [((arr >> (32 * k)) & 0xFFFFFFFF).astype(np.uint32) for k in range(4)]
    return jnp.asarray(np.stack(limbs, axis=-1))


def to_ints(limbs):
    """(..., 4) uint32 limb array -> numpy object array of Python ints."""
    arr = np.asarray(limbs).astype(object)
    return arr[..., 0] | (arr[..., 1] << 32) | (arr[..., 2] << 64) | (arr[..., 3] << 96)


def zeros(shape):
    return jnp.zeros(tuple(shape) + (4,), dtype=_U32)


def full(shape, value):
    limbs = [(int(value) >> (32 * k)) & 0xFFFFFFFF for k in range(4)]
    return jnp.broadcast_to(jnp.array(limbs, dtype=_U32), tuple(shape) + (4,))


def constant(value):
    return jnp.array([(int(value) >> (32 * k)) & 0xFFFFFFFF for k in range(4)], dtype=_U32)


# ------------------------------------------------------------------------------------------------
# addition / subtraction
# ------------------------------------------------------------------------------------------------

def _raw_add(a, b):
    """4-limb add -> (sum limbs, carry-out in {0,1})."""
    out = []
    carry = jnp.zeros(a.shape[:-1], dtype=_U32)
    for k in range(4):
        t = a[..., k] + b[..., k]
        c = (t < a[..., k]).astype(_U32)
        t2 = t + carry
        c = c + (t2 < t).astype(_U32)
        out.append(t2)
        carry = c
    return jnp.stack(out, axis=-1), carry


def _raw_sub(a, b):
    """4-limb subtract -> (diff limbs, borrow-out in {0,1})."""
    out = []
    borrow = jnp.zeros(a.shape[:-1], dtype=_U32)
    for k in range(4):
        t = a[..., k] - b[..., k]
        bo = (a[..., k] < b[..., k]).astype(_U32)
        t2 = t - borrow
        bo = bo + (t < borrow).astype(_U32)
        out.append(t2)
        borrow = bo
    return jnp.stack(out, axis=-1), borrow


_M_LIMBS_NP = np.array([(M >> (32 * k)) & 0xFFFFFFFF for k in range(4)], dtype=np.uint32)


def _geq_m(a):
    """a >= M, lexicographic over limbs (bool array)."""
    m = jnp.asarray(_M_LIMBS_NP)
    gt = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
    eq = jnp.ones(a.shape[:-1], dtype=jnp.bool_)
    for k in (3, 2, 1, 0):
        gt = gt | (eq & (a[..., k] > m[k]))
        eq = eq & (a[..., k] == m[k])
    return gt | eq


@jax.jit
def add(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    s, carry = _raw_add(a, b)
    m = jnp.broadcast_to(jnp.asarray(_M_LIMBS_NP), s.shape)
    # s >= M iff the trial subtraction does not borrow; when the add carried
    # out (s >= 2^128 > M) the limb-wrapped difference is still s - M, so the
    # borrow flag replaces a separate lexicographic _geq_m compare (~1/3 of
    # the former add cost)
    d, borrow = _raw_sub(s, m)
    need = (carry > 0) | (borrow == 0)
    return jnp.where(need[..., None], d, s)


@jax.jit
def sub(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    d, borrow = _raw_sub(a, b)
    m = jnp.broadcast_to(jnp.asarray(_M_LIMBS_NP), d.shape)
    d2, _ = _raw_add(d, m)
    return jnp.where((borrow > 0)[..., None], d2, d)


def neg(a):
    return sub(zeros(a.shape[:-1]), a)


# ------------------------------------------------------------------------------------------------
# multiplication
# ------------------------------------------------------------------------------------------------

def _to_halfwords(a):
    """(..., 4) u32 limbs -> list of 8 (...,) u32 arrays holding 16-bit values."""
    out = []
    for k in range(4):
        out.append(a[..., k] & _MASK16)
        out.append(a[..., k] >> 16)
    return out


def _from_halfwords(h):
    """list of 8 halfword arrays -> (..., 4) u32 limbs."""
    limbs = [h[2 * k] | (h[2 * k + 1] << 16) for k in range(4)]
    return jnp.stack(limbs, axis=-1)


def _carry_normalize(cols, out_len):
    """Propagate carries so each output halfword is < 2^16."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for k in range(out_len):
        v = (cols[k] if k < len(cols) else jnp.zeros_like(carry)) + carry
        out.append(v & _MASK16)
        carry = v >> 16
    return out, carry


def _borrow_sub_halfwords(a, b):
    """Halfword-wise a - b with borrow chain; values must satisfy a >= b.
    Inputs are lists of (...,) u32 arrays each < 2^16."""
    n = len(a)
    out = []
    borrow = jnp.zeros_like(a[0])
    for k in range(n):
        bk = b[k] if k < len(b) else jnp.zeros_like(borrow)
        t = a[k] + jnp.uint32(0x10000) - bk - borrow
        out.append(t & _MASK16)
        borrow = jnp.uint32(1) - (t >> 16)
    return out, borrow


def _mul_by_r(h):
    """x * (45*2^40 - 1) for x given as len(h) halfwords (< 2^16 each);
    returns len(h) + 4 halfwords.

    (x*45) << 8 computes in ONE carry pass (each column < 45*2^16*2^8 <
    2^30, exact in u32); the two zero slots prepend the remaining *2^32 of
    the 40-bit shift, and subtracting x yields x*R.  Length-generic so the
    reduction's second fold runs on its true 3-halfword width instead of
    padding to 8 (the former fixed-width version cost ~70 extra ops/mul)."""
    y, carry = _carry_normalize(
        [(hk * jnp.uint32(45)) << 8 for hk in h], len(h) + 2)
    # carry is 0: x*45*2^8 < 2^(16*len(h)+14) fits len(h)+2 columns
    z = [jnp.zeros_like(h[0]), jnp.zeros_like(h[0])] + y
    out, _ = _borrow_sub_halfwords(z, h)
    return out


def _add_halfwords(a, b, out_len):
    cols = []
    n = max(len(a), len(b), out_len)
    for k in range(n):
        ak = a[k] if k < len(a) else None
        bk = b[k] if k < len(b) else None
        if ak is None and bk is None:
            cols.append(jnp.zeros_like(a[0]))
        elif ak is None:
            cols.append(bk)
        elif bk is None:
            cols.append(ak)
        else:
            cols.append(ak + bk)
    out, carry = _carry_normalize(cols, out_len)
    return out


def _reduce_256(h):
    """Reduce a 256-bit value (16 halfwords) mod M -> (..., 4) u32 limbs."""
    lo, hi = h[:8], h[8:16]
    # fold high 128 bits: p1 = hi * R + lo  (< 2^174 + 2^128 -> 12 halfwords,
    # so p1[11] is always 0 and p1_hi = p1 >> 128 spans 3 halfwords)
    p1 = _add_halfwords(_mul_by_r(hi), lo, 12)
    # fold again: p2 = p1_hi * R + p1_lo  (p1_hi < 2^46 -> p2 < 2^128 + 2^92)
    p2 = _add_halfwords(_mul_by_r(p1[8:11]), p1[:8], 9)
    # last fold: bit 128 of p2 is 0 or 1
    hi2 = p2[8]
    r = [hi2 * jnp.uint32(w) for w in R_HALFWORDS]
    p3 = _add_halfwords(r, p2[:8], 8)
    # conditional subtract M
    m = [jnp.full_like(h[0], w) for w in M_HALFWORDS]
    d, borrow = _borrow_sub_halfwords(p3, m)
    use_d = (borrow == 0)[..., None]
    return jnp.where(use_d, _from_halfwords(d), _from_halfwords(p3))


@jax.jit
def mul(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    ah = _to_halfwords(a)
    bh = _to_halfwords(b)
    cols = [None] * 16
    for i in range(8):
        for j in range(8):
            p = ah[i] * bh[j]
            plo = p & _MASK16
            phi = p >> 16
            cols[i + j] = plo if cols[i + j] is None else cols[i + j] + plo
            k = i + j + 1
            cols[k] = phi if cols[k] is None else cols[k] + phi
    h, _ = _carry_normalize(cols, 16)
    return _reduce_256(h)


def sqr(a):
    return mul(a, a)


def cube(a):
    return mul(sqr(a), a)


def mul_scalar(a, c):
    """Multiply array by a Python-int constant."""
    return mul(a, jnp.broadcast_to(constant(c), a.shape))


@functools.partial(jax.jit, static_argnums=(1,))
def exp_const(a, e):
    """a ** e for a fixed Python-int exponent.

    Implemented as a lax.scan over the exponent bits (one square + one
    selected multiply per bit) so the compiled graph stays small even for
    128-bit exponents like M-2 or INV_ALPHA.

    Note: follows plain modular exponentiation (0^0 == 1); the reference's
    exp(0, p) == 0 quirk only matters for scalar host paths.
    """
    e = int(e)
    if e == 0:
        return full(a.shape[:-1], 1)
    if e == 1:
        return a
    if e == 2:
        return sqr(a)
    if e == 3:
        return cube(a)
    nbits = e.bit_length()
    bits = jnp.array([(e >> k) & 1 for k in range(nbits)], dtype=jnp.bool_)

    def body(carry, bit):
        result, base = carry
        with_mul = mul(result, base)
        result = jnp.where(bit, with_mul, result)
        base = sqr(base)
        return (result, base), None

    init = (full(a.shape[:-1], 1), a)
    (result, _), _ = jax.lax.scan(body, init, bits)
    return result


# ------------------------------------------------------------------------------------------------
# scans: batch inversion, cumulative products/sums, power series
# ------------------------------------------------------------------------------------------------

def _is_zero(a):
    return (a[..., 0] | a[..., 1] | a[..., 2] | a[..., 3]) == 0


@functools.partial(jax.jit, static_argnums=(1,))
def inv_batch(a, axis=0):
    """Elementwise inverse via Fermat's little theorem: a^(M-2).

    M-2 is odd, so zeros map to zero automatically (reference convention).
    Fermat keeps the compiled graph compact (a single scanned multiply);
    a Montgomery-trick Pallas kernel can replace this on the hot path later.
    """
    return exp_const(a, M - 2)


@functools.partial(jax.jit, static_argnums=(1,))
def cumsum(a, axis=0):
    return jax.lax.associative_scan(add, a, axis=axis)


@jax.jit
def inv_batch_scan(a):
    """Montgomery-trick batched inversion over the flattened batch: two
    log-depth cumulative products plus ONE Fermat chain on the total,
    versus inv_batch's 127-squaring chain on EVERY element (the dominant
    compute of the DEEP composition - measured ~0.5 s at 2^21 rows).

    inv(a_i) = prefix_{i-1} * inv(total) * suffix_{i+1}; zeros are masked
    to 1 for the scans and map back to 0 (inv_batch's convention)."""
    shape = a.shape
    flat = a.reshape(-1, 4)
    zero_mask = _is_zero(flat)
    one = jnp.zeros_like(flat).at[:, 0].set(1)
    safe = jnp.where(zero_mask[:, None], one, flat)

    prefix = jax.lax.associative_scan(mul, safe, axis=0)       # incl. prefix
    total_inv = inv_batch(prefix[-1:])                          # one Fermat
    suffix = jnp.flip(
        jax.lax.associative_scan(mul, jnp.flip(safe, axis=0), axis=0), axis=0)

    shifted_prefix = jnp.concatenate([one[:1], prefix[:-1]])    # prefix_{i-1}
    shifted_suffix = jnp.concatenate([suffix[1:], one[:1]])     # suffix_{i+1}
    inv = mul(mul(shifted_prefix, jnp.broadcast_to(total_inv, flat.shape)),
              shifted_suffix)
    inv = jnp.where(zero_mask[:, None], jnp.zeros_like(inv), inv)
    return inv.reshape(shape)


def sum_reduce(a, axis=0):
    """Modular sum along an axis (log-depth tree reduction)."""
    n = a.shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(a, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(a, half, 2 * half, axis=axis)
        s = add(lo, hi)
        if n % 2 == 1:
            rem = jax.lax.slice_in_dim(a, 2 * half, n, axis=axis)
            s = jnp.concatenate([s, rem], axis=axis)
        a = s
        n = a.shape[axis]
    return jnp.squeeze(a, axis=axis)


def power_series(x_int, n):
    """[x^0, x^1, ..., x^(n-1)] as an (n, 4) device array.

    Delegates to the traced-base variant: with the base as a static constant
    the whole scan is constant-foldable and XLA's compile-time HLO evaluator
    spends minutes materializing it (measured 233s at n=2^15); passing the
    base as a runtime array keeps compilation in milliseconds."""
    return power_series_dev(constant(int(x_int)), n)


def _ps_scan(x, n):
    """[x^0 .. x^(n-1)] by scanned doublings: log2(n) muls per element."""
    bits = max((n - 1).bit_length(), 1)
    idx = jnp.arange(n, dtype=jnp.uint32)
    ks = jnp.arange(bits, dtype=jnp.uint32)

    def body(carry, k):
        result, p = carry
        use = ((idx >> k) & 1) == 1
        stepped = mul(result, jnp.broadcast_to(p[None, :], result.shape))
        result = jnp.where(use[:, None], stepped, result)
        return (result, sqr(p)), None

    (result, _), _ = jax.lax.scan(body, (full((n,), 1), x), ks)
    return result


@functools.partial(jax.jit, static_argnums=(1,))
def power_series_dev(x, n):
    """[x^0 .. x^(n-1)] for a traced (4,) limb base x.

    Baby-step/giant-step: B = [x^0 .. x^(s-1)] and A = [(x^s)^0 ..] come
    from ~sqrt(n)-length doubling scans, and the series is their outer
    product - ~1 mul per element instead of the former log2(n) muls per
    element (the whole-length scan multiplied every row once per exponent
    bit; at 2^16-row tiles that was 16x the arithmetic of the consumers of
    these series).  Bit-identical values: modular exponentiation either way.
    """
    if n <= 64:
        return _ps_scan(x, n)
    s = 1 << (((n - 1).bit_length() + 1) // 2)    # 2^ceil(bits/2) ~ sqrt(n)
    hi = (n + s - 1) // s
    B = _ps_scan(x, s)                            # (s, 4)
    A = _ps_scan(mul(B[s - 1], x), hi)            # powers of x^s: (hi, 4)
    out = mul(A[:, None, :], B[None, :, :])       # (hi, s, 4)
    return out.reshape(hi * s, 4)[:n]


def dot(a, b, axis=0):
    """Modular inner product along an axis."""
    return sum_reduce(mul(a, b), axis=axis)


# ------------------------------------------------------------------------------------------------
# NTT
# ------------------------------------------------------------------------------------------------

def _bitrev_indices(n):
    """Bit-reversal permutation indices, vectorized on host."""
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint64)
    rev = np.zeros_like(idx)
    for _ in range(bits):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev.astype(np.int32)


@jax.jit
def _stage_twiddles(tw):
    """(n/2, 4) power series -> (levels, n/2, 4) per-stage twiddle rows.

    Stage s of the Pease network multiplies pair i by W[i & ~(2^s - 1)],
    i.e. the power series with each stride-2^s entry repeated 2^s times.
    jnp.repeat with static counts lowers to broadcast+reshape - building
    the whole table costs no gathers, and the butterfly loop then reads
    its stage row with a dynamic slice.  (The obvious per-stage gather
    W[(i >> s) << s] is avoided deliberately: the tunneled XLA backend's
    compile time scales with gather size - a 2^20-element gather pushed
    one compile past 50 minutes.)
    """
    n2 = tw.shape[0]
    levels = n2.bit_length()  # log2(n) for n = 2*n2
    rows = [tw]
    for s in range(1, levels):
        rows.append(jnp.repeat(tw[:: 1 << s], 1 << s, axis=0))
    return jnp.stack(rows)


@jax.jit
def _ntt_stages(values, tw):
    """Constant-geometry (Pease) radix-2 DIF NTT stages.

    Every stage performs the same data movement - butterfly pairs
    (i, i + n/2), outputs interleaved to (2i, 2i+1) - so the whole transform
    is a fori_loop over one compact butterfly body.  Output is bit-reversed;
    ntt() applies the final un-permutation.  This shape maps directly onto
    TPU: contiguous slices, one vector multiply per stage, no gathers, no
    scatters.
    """
    n = values.shape[0]
    levels = n.bit_length() - 1
    W = _stage_twiddles(tw)

    def body(s, x):
        a = x[: n // 2]
        b = x[n // 2 :]
        w = jax.lax.dynamic_index_in_dim(W, s, axis=0, keepdims=False)
        even = add(a, b)
        odd = mul(sub(a, b), w)
        return jnp.stack([even, odd], axis=1).reshape(n, 4)

    return jax.lax.fori_loop(0, levels, body, values)


@functools.partial(jax.jit, static_argnums=(1,))
def _bitrev_permute(values, n):
    """Bit-reversal permutation of the leading axis without a full-size
    gather: split the index bits i = u*B + v, so rev_n maps
    out.reshape(B, A)[rev_b(v), rev_a(u)] = in.reshape(A, B)[u, v] - two
    small row/column gathers (A- and B-sized index vectors) plus one
    transpose, instead of one n-sized gather."""
    if n <= 1024:
        return values[jnp.asarray(_bitrev_indices(n))]
    bits = n.bit_length() - 1
    a_bits = bits // 2
    A, B = 1 << a_bits, n >> a_bits
    x = values.reshape(A, B, 4)
    x = x[jnp.asarray(_bitrev_indices(A))]
    x = x[:, jnp.asarray(_bitrev_indices(B))]
    return x.transpose(1, 0, 2).reshape(n, 4)


def ntt(values, root_int=None):
    """Evaluate: coefficients -> evaluations over the size-n root-of-unity
    domain, natural order in and out."""
    n = values.shape[0]
    if n == 1:
        return values
    if root_int is None:
        root_int = hostfield.get_root_of_unity(n)
    tw = power_series(int(root_int), n // 2)
    out = _ntt_stages(values, tw)
    return _bitrev_permute(out, n)


def intt(values, root_int=None):
    """Interpolate: evaluations -> coefficients, natural order in and out."""
    n = values.shape[0]
    if n == 1:
        return values
    if root_int is None:
        root_int = hostfield.get_root_of_unity(n)
    inv_root = pow(int(root_int), n - 1, M)
    tw = power_series(inv_root, n // 2)
    out = _bitrev_permute(_ntt_stages(values, tw), n)
    inv_n = hostfield.inv(n)
    return mul(out, jnp.broadcast_to(constant(inv_n), out.shape))


# ------------------------------------------------------------------------------------------------
# four-step NTT for domains whose Pease working set exceeds HBM
# ------------------------------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def _twiddle_rows(bases, n):
    """vmapped power series: (R, 4) bases -> (R, n, 4) rows of powers."""
    return jax.vmap(lambda b: power_series_dev(b, n))(bases)


def ntt_four_step(values, root_int=None, max_rows=None):
    """Evaluate a size-N coefficient vector over the size-N domain by the
    Bailey four-step decomposition N = N1 x N2:

        A[k1, k2] = a[k1 + N1*k2]
        B[k1, :]  = NTT_N2(A[k1, :])            (row transforms)
        B[k1, j2] *= w^(k1*j2)                  (twiddles)
        C[:, j2]  = NTT_N1(B[:, j2])            (column transforms)
        X[j1*N2 + j2] = C[j1, j2]               (row-major readout)

    Identical field values to ntt() (same polynomial, same domain, natural
    order) but the working set is bounded by the row-batch size: the Pease
    kernel holds ~26x the lane bytes in HLO temps, which at N = 2^25 is
    ~14 GB for a single register - over HBM.  Here each dispatch works on
    (batch, N2) or (N1, batch) tiles.

    The k1-dependent twiddle rows w^(k1*j2) build from a (batch, N2) table
    W_small[r, j2] = w^(r*j2) scaled by the chunk prefix w^(lo*j2) - both
    power series, no modular exponentiation per element.
    """
    n = values.shape[0]
    if root_int is None:
        root_int = hostfield.get_root_of_unity(n)
    root_int = int(root_int)

    log_n = n.bit_length() - 1
    log_n1 = log_n // 2
    n1, n2 = 1 << log_n1, n >> log_n1
    if max_rows is None:
        import os
        budget = int(os.environ.get("DISTAFF_NTT_BUDGET_BYTES", 6 << 30))
        max_rows = max(1, budget // (n2 * 16 * 26))
    rb = min(n1, max_rows)
    while n1 % rb:
        rb -= 1

    root_n2 = pow(root_int, n1, M)          # size-N2 root
    root_n1 = pow(root_int, n2, M)          # size-N1 root

    # A[k1, k2] = a[k1 + N1 k2]
    A = values.reshape(n2, n1, 4).transpose(1, 0, 2)

    tw2 = power_series(root_n2, n2 // 2)
    w_small = _twiddle_rows(
        power_series(root_int, rb), n2)      # (rb, N2, 4): w^(r*j2)

    rows = []
    for lo in range(0, n1, rb):
        chunk = jax.lax.dynamic_slice_in_dim(A, lo, rb, axis=0)
        b = jax.vmap(lambda v: _bitrev_permute(_ntt_stages(v, tw2), n2))(chunk)
        prefix = power_series(pow(root_int, lo, M), n2)   # w^(lo*j2)
        rows.append(mul(b, mul(w_small, prefix[None, :, :])))
    B = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)

    # column transforms: NTT along axis 0 with the columns as batch
    tw1 = power_series(root_n1, n1 // 2)
    rev1 = jnp.asarray(_bitrev_indices(n1))
    cb = min(n2, max(1, (max_rows * n2) // n1))
    while n2 % cb:
        cb -= 1

    cols = []
    for lo in range(0, n2, cb):
        chunk = jax.lax.dynamic_slice_in_dim(B, lo, cb, axis=1)
        cols.append(_ntt_stages_batched(chunk, tw1)[rev1])
    C = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)

    return C.reshape(n, 4)


@jax.jit
def _ntt_stages_batched(values, tw):
    """Pease NTT stages along axis 0 of an (n, B, 4) array."""
    n = values.shape[0]
    b = values.shape[1]
    levels = n.bit_length() - 1
    W = _stage_twiddles(tw)

    def body(s, x):
        a = x[: n // 2]
        c = x[n // 2 :]
        w = jax.lax.dynamic_index_in_dim(W, s, axis=0, keepdims=False)[:, None, :]
        even = add(a, c)
        odd = mul(sub(a, c), jnp.broadcast_to(w, a.shape))
        return jnp.stack([even, odd], axis=1).reshape(n, b, 4)

    return jax.lax.fori_loop(0, levels, body, values)


@jax.jit
def _ntt_stages_bm(values, tw):
    """Pease NTT stages along axis 1 of a batch-MAJOR (B, n, 4) array.

    Same butterfly network as _ntt_stages_batched with the batch axis moved
    to the major position (see ops.tiles.ntt_batched for why batch-major
    matters on TPU: minor-position small batch dims force padded layouts)."""
    b = values.shape[0]
    n = values.shape[1]
    levels = n.bit_length() - 1
    W = _stage_twiddles(tw)

    def body(s, x):
        a = x[:, : n // 2]
        c = x[:, n // 2 :]
        w = jax.lax.dynamic_index_in_dim(W, s, axis=0, keepdims=False)[None]
        even = add(a, c)
        odd = mul(sub(a, c), jnp.broadcast_to(w, a.shape))
        return jnp.stack([even, odd], axis=2).reshape(b, n, 4)

    return jax.lax.fori_loop(0, levels, body, values)
