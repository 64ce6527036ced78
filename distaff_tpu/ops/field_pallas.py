"""Pallas TPU kernels for the 128-bit field hot path.

The NTT butterfly stage is the prover's dominant kernel: for each pair
(a, b) compute (a + b, (a - b) * w) mod M.  This module implements it as a
single fused Pallas kernel over structure-of-arrays limb planes - four
uint32 lanes per operand - so one kernel invocation does the work the jnp
path spreads over ~400 XLA ops (adds with carry chains, 16 half-word
partial products, and the R-folding reduction), keeping everything in VMEM.

Data layout: a field column of n elements is four (n/128, 128) uint32 limb
planes (lane-major), aligned to the VPU's 8x128 tiles.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math import field

M = field.M
_M_LIMBS = tuple((M >> (32 * k)) & 0xFFFFFFFF for k in range(4))
_R_HALF = tuple(((45 * 2**40 - 1) >> (16 * k)) & 0xFFFF for k in range(3))

MASK16 = 0xFFFF  # plain int: jnp scalars would be captured consts in pallas kernels


def _to_halves(l):
    """4 limb arrays -> 8 halfword arrays."""
    out = []
    for k in range(4):
        out.append(l[k] & MASK16)
        out.append(l[k] >> 16)
    return out


def _carry_norm(cols, out_len):
    out = []
    carry = jnp.zeros_like(cols[0])
    for k in range(out_len):
        v = (cols[k] if k < len(cols) else jnp.zeros_like(carry)) + carry
        out.append(v & MASK16)
        carry = v >> 16
    return out, carry


def _borrow_sub_h(a, b):
    n = max(len(a), len(b))
    out = []
    borrow = jnp.zeros_like(a[0])
    big = np.uint32(0x10000)
    for k in range(n):
        ak = a[k] if k < len(a) else jnp.zeros_like(borrow)
        bk = b[k] if k < len(b) else jnp.zeros_like(borrow)
        t = ak + big - bk - borrow
        out.append(t & MASK16)
        borrow = np.uint32(1) - (t >> 16)
    return out, borrow


def _mul_by_r(h):
    y, _ = _carry_norm([hk * np.uint32(45) for hk in h], len(h) + 1)
    y, carry = _carry_norm([yk << 8 for yk in y], len(h) + 1)
    y = y + [carry]
    z = [jnp.zeros_like(h[0]), jnp.zeros_like(h[0])] + y
    out, _ = _borrow_sub_h(z, h)
    return out


def _add_h(a, b, out_len):
    cols = []
    for k in range(max(len(a), len(b), out_len)):
        ak = a[k] if k < len(a) else None
        bk = b[k] if k < len(b) else None
        if ak is None:
            cols.append(bk if bk is not None else jnp.zeros_like(a[0]))
        elif bk is None:
            cols.append(ak)
        else:
            cols.append(ak + bk)
    out, _ = _carry_norm(cols, out_len)
    return out


def _reduce256_h(h):
    """16 halfwords -> 4 reduced limb arrays."""
    lo, hi = h[:8], h[8:16]
    p1 = _add_h(_mul_by_r(hi), lo, 12)
    p2 = _add_h(_mul_by_r(p1[8:12] + [jnp.zeros_like(h[0])] * 4), p1[:8], 9)
    hi2 = p2[8]
    r = [hi2 * np.uint32(w) for w in _R_HALF]
    p3 = _add_h(r, p2[:8], 8)
    m = [jnp.full_like(h[0], (M >> (16 * k)) & 0xFFFF) for k in range(8)]
    d, borrow = _borrow_sub_h(p3, m)
    use_d = borrow == 0
    out = [jnp.where(use_d, d[2 * k] | (d[2 * k + 1] << 16),
                     p3[2 * k] | (p3[2 * k + 1] << 16)) for k in range(4)]
    return out


def _mul_limbs(a, b):
    """Full 128x128 modular multiply on limb-plane lists."""
    ah = _to_halves(a)
    bh = _to_halves(b)
    cols = [None] * 16
    for i in range(8):
        for j in range(8):
            p = ah[i] * bh[j]
            lo = p & MASK16
            hi = p >> 16
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    h, _ = _carry_norm(cols, 16)
    return _reduce256_h(h)


def _add_limbs(a, b):
    out = []
    carry = jnp.zeros_like(a[0])
    for k in range(4):
        t = a[k] + b[k]
        c = (t < a[k]).astype(jnp.uint32)
        t2 = t + carry
        c = c + (t2 < t).astype(jnp.uint32)
        out.append(t2)
        carry = c
    # conditional subtract M (value < 2M)
    m = [jnp.full_like(a[0], w) for w in _M_LIMBS]
    d = []
    borrow = jnp.zeros_like(a[0])
    for k in range(4):
        t = out[k] - m[k]
        bo = (out[k] < m[k]).astype(jnp.uint32)
        t2 = t - borrow
        bo = bo + (t < borrow).astype(jnp.uint32)
        d.append(t2)
        borrow = bo
    need = (carry > 0) | (borrow == 0)
    return [jnp.where(need, d[k], out[k]) for k in range(4)]


def _sub_limbs(a, b):
    d = []
    borrow = jnp.zeros_like(a[0])
    for k in range(4):
        t = a[k] - b[k]
        bo = (a[k] < b[k]).astype(jnp.uint32)
        t2 = t - borrow
        bo = bo + (t < borrow).astype(jnp.uint32)
        d.append(t2)
        borrow = bo
    m = [jnp.full_like(a[0], w) for w in _M_LIMBS]
    out = []
    carry = jnp.zeros_like(a[0])
    under = borrow > 0
    for k in range(4):
        add_k = jnp.where(under, m[k], jnp.zeros_like(m[k]))
        t = d[k] + add_k
        c = (t < d[k]).astype(jnp.uint32)
        t2 = t + carry
        c = c + (t2 < t).astype(jnp.uint32)
        out.append(t2)
        carry = c
    return out


def _butterfly_kernel(a0, a1, a2, a3, b0, b1, b2, b3, w0, w1, w2, w3,
                      e0, e1, e2, e3, o0, o1, o2, o3):
    a = [a0[:], a1[:], a2[:], a3[:]]
    b = [b0[:], b1[:], b2[:], b3[:]]
    w = [w0[:], w1[:], w2[:], w3[:]]

    even = _add_limbs(a, b)
    diff = _sub_limbs(a, b)
    odd = _mul_limbs(diff, w)

    e0[:], e1[:], e2[:], e3[:] = even
    o0[:], o1[:], o2[:], o3[:] = odd


def _on_tpu(x):
    try:
        return next(iter(x.devices())).platform != "cpu"
    except Exception:
        return True


@functools.partial(jax.jit, static_argnums=(3, 4))
def butterfly_stage_planes(a_planes, b_planes, w_planes, block_rows=256, interpret=False):
    """Fused butterfly: (a + b, (a - b) * w) on (4, rows, 128) limb planes."""
    rows = a_planes.shape[1]
    block = min(block_rows, rows)
    grid = (rows // block,)

    spec = pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    specs = [spec] * 12
    out_specs = [spec] * 8
    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.uint32)] * 8

    args = [a_planes[k] for k in range(4)] + [b_planes[k] for k in range(4)] \
         + [w_planes[k] for k in range(4)]
    outs = pl.pallas_call(
        _butterfly_kernel,
        grid=grid,
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,  # CPU fallback for tests without a TPU
    )(*args)
    even = jnp.stack(outs[:4])
    odd = jnp.stack(outs[4:])
    return even, odd


def to_planes(x):
    """(n, 4) limb array -> (4, n/128, 128) limb planes."""
    n = x.shape[0]
    return jnp.transpose(x, (1, 0)).reshape(4, n // 128, 128)


def from_planes(p):
    """(4, rows, 128) -> (n, 4)."""
    n = p.shape[1] * 128
    return jnp.transpose(p.reshape(4, n), (1, 0))


def butterfly_stage(a, b, w, interpret=None):
    """Convenience wrapper on (n, 4) limb arrays (n multiple of 128)."""
    if interpret is None:
        interpret = not _on_tpu(a)
    even_p, odd_p = butterfly_stage_planes(
        to_planes(a), to_planes(b), to_planes(w), 256, interpret)
    return from_planes(even_p), from_planes(odd_p)


# ------------------------------------------------------------------------------------------------
# multi-stage leaf NTT: ALL stages of a size-n_leaf transform fused in VMEM
# ------------------------------------------------------------------------------------------------
#
# The four-step recursion (ops/tiles.py) reduces every big NTT to batched
# leaf transforms of size <= LEAF (default 1024).  A leaf fits VMEM whole,
# so one kernel invocation reads each element once from HBM, runs all
# log2(n_leaf) butterfly stages in VMEM, and writes once - versus one HBM
# round trip PER STAGE for both the stage-at-a-time Pallas kernel above and
# the XLA fori_loop path (XLA cannot fuse across the loop's iterations).


def _leaf_ntt_kernel(n_leaf, a0, a1, a2, a3, w0, w1, w2, w3,
                     o0, o1, o2, o3):
    """One block: (n_leaf, bt) limb planes - the transform runs along the
    SUBLANE (row) axis with the batch on the 128-wide lane axis, so the
    per-stage Pease interleave is a row-axis reshape (lane dim untouched -
    Mosaic rejects lane-dim reshapes); twiddles: (levels, n_leaf/2)."""
    w_all = [w0[:], w1[:], w2[:], w3[:]]
    bt = a0.shape[1]
    half = n_leaf // 2
    levels = n_leaf.bit_length() - 1

    # unrolled Python loop: Mosaic supports neither dynamic_slice (so no
    # fori_loop-indexed twiddle rows) nor VMEM-stack reuse across the body,
    # hence the narrow lane blocks chosen by the caller
    x = [a0[:], a1[:], a2[:], a3[:]]
    for s in range(levels):
        a = [xk[:half] for xk in x]
        b = [xk[half:] for xk in x]
        w = [jnp.broadcast_to(wk[s][:, None], (half, bt)) for wk in w_all]
        even = _add_limbs(a, b)
        diff = _sub_limbs(a, b)
        odd = _mul_limbs(diff, w)
        # Pease interleave along the transform (row) axis
        x = [jnp.stack([even[k], odd[k]], axis=1).reshape(n_leaf, bt)
             for k in range(4)]
    o0[:], o1[:], o2[:], o3[:] = x


@functools.partial(jax.jit, static_argnums=(2,))
def _leaf_ntt_planes(planes, w_planes, interpret):
    """planes: (4, n_leaf, B) limb planes (transform axis 1, batch axis 2);
    w_planes: (4, levels, n_leaf/2) per-stage twiddle rows -> transformed
    planes, PEASE (bit-reversed) order along the transform axis."""
    n_leaf, b = planes.shape[1], planes.shape[2]
    levels = n_leaf.bit_length() - 1
    # Mosaic requires the lane (last) block dim be a multiple of 128 or the
    # whole axis; the unrolled stages' temporaries at 128 lanes x n_leaf=1024
    # measure ~52 MB of scoped VMEM, which fits v5e's 128 MB budget once the
    # default conservative limit is raised below
    block = min(128, b)
    assert b % block == 0

    col_spec = pl.BlockSpec(
        (n_leaf, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(
        (levels, n_leaf // 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_leaf_ntt_kernel, n_leaf),
        grid=(b // block,),
        in_specs=[col_spec] * 4 + [w_spec] * 4,
        out_specs=[col_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((n_leaf, b), jnp.uint32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*[planes[k] for k in range(4)], *[w_planes[k] for k in range(4)])
    return jnp.stack(outs)


def _stage_twiddle_planes(tw):
    """(n/2, 4) power series -> (4, levels, n/2) per-stage rows (stage s
    row = the series with each stride-2^s entry repeated 2^s times;
    mirrors field_jax._stage_twiddles)."""
    n2 = tw.shape[0]
    levels = n2.bit_length()
    rows = [tw]
    for s in range(1, levels):
        step = 1 << s
        rows.append(jnp.reshape(
            jnp.broadcast_to(tw[::step, :][:, None, :],
                             (n2 // step, step, 4)), (n2, 4)))
    stacked = jnp.stack(rows)                  # (levels, n/2, 4)
    return jnp.transpose(stacked, (2, 0, 1))   # (4, levels, n/2)


def leaf_ntt_bm(values, tw, interpret=None):
    """Drop-in for field_jax._ntt_stages_bm + bit-reversal: (B, n_leaf, 4)
    batch-major values, tw = (n_leaf/2, 4) root power series -> natural-
    order NTT along axis 1, computed with every stage fused in VMEM."""
    from ..math import field_jax as fj

    if interpret is None:
        interpret = not _on_tpu(values)
    b, n_leaf = values.shape[0], values.shape[1]
    planes = jnp.transpose(values, (2, 1, 0))          # (4, n, B)
    w_planes = _stage_twiddle_planes(tw)
    out = _leaf_ntt_planes(planes, w_planes, bool(interpret))
    out = jnp.transpose(out, (2, 1, 0))                # (B, n, 4)
    rev = fj._bitrev_indices(n_leaf)
    return out[:, rev]


# ------------------------------------------------------------------------------------------------
# full NTT built from the fused butterfly kernel
# ------------------------------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _ntt_pallas_impl(values, n, root_int, interpret=False):
    from ..math import field_jax as fj

    levels = n.bit_length() - 1
    W = fj.power_series(root_int, n // 2)
    pair_idx = jnp.arange(n // 2, dtype=jnp.uint32)
    cur = values
    for s in range(levels):
        w = W[((pair_idx >> s) << s).astype(jnp.int32)]
        even, odd = butterfly_stage(cur[: n // 2], cur[n // 2 :], w, interpret)
        cur = jnp.stack([even, odd], axis=1).reshape(n, 4)
    rev = jnp.asarray(fj._bitrev_indices(n))
    return cur[rev]


def ntt_pallas(values, root_int=None):
    """Natural-order NTT where every butterfly stage is one fused Pallas
    kernel call (n must be a multiple of 256)."""
    n = values.shape[0]
    if root_int is None:
        root_int = field.get_root_of_unity(n)
    interpret = not _on_tpu(values)
    return _ntt_pallas_impl(values, n, int(root_int), interpret)
