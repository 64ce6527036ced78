"""Geometry-stable (fixed-tile) device kernels.

Every jitted kernel in the proving pipeline specializes on its input shapes,
and those shapes scale with the trace geometry - so each new trace length
used to trigger a fresh set of XLA compiles.  In this deployment the XLA
compile path runs over a network tunnel where a single kernel compile costs
seconds to minutes, and even *loading* a persistently-cached executable costs
seconds - so per-geometry kernels made the first proof at each size cost
minutes of wall clock (measured: 621 s for a 2^12-step trace, ~390 s with a
fully warm persistent cache).

This module re-expresses the shape-dependent kernels as loops over
fixed-shape tiles:

- pointwise row work (FRI folds, power series, scaling) runs on (TILE, 4)
  limb tiles, padded at the end;
- batched-leaf NTTs decompose any size-n transform into Bailey four-step
  recursion whose device kernels only ever see (LEAF, BTILE, 4) tiles;
- BLAKE3 leaf hashing runs on (HASH_TILE, W) row tiles;
- weighted register sums tile both the register axis (fixed-size groups,
  zero-padded weights) and the domain axis.

One compiled kernel set therefore serves every trace length, every
extension factor, and every register count: proving a fresh program size
reuses the in-process executables that the first proof loaded.

All functions compute bit-identical field values to their per-shape
equivalents in math.field_jax / ops.fri_jax (tiling is pure data movement);
tests/test_tiles.py asserts equality against those and against host bigint
oracles.

Tile sizes come from env vars once at import (tests set them small to
exercise multi-tile and recursion paths on tiny inputs):
    DISTAFF_TILE       pointwise rows per tile        (default 2^16)
    DISTAFF_NTT_LEAF   leaf transform size            (default 2^10)
    DISTAFF_NTT_BTILE  leaf batch columns per tile    (default 2^9)
"""

import collections
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..math import field as hostfield
from ..math import field_jax as fj

M = hostfield.M

TILE = int(os.environ.get("DISTAFF_TILE", 1 << 16))
LEAF = int(os.environ.get("DISTAFF_NTT_LEAF", 1 << 10))
BTILE = int(os.environ.get("DISTAFF_NTT_BTILE", 1 << 9))
# canonical NTT geometry (round 5): transforms of size <= NCAP run directly
# on ONE fixed-shape kernel per size (batch tiled to CANON_ELEMS/n rows);
# larger transforms take one eager four-step level with n2 = NCAP.  The
# executable set is therefore keyed by n alone - every trace length shares
# it, which is what lets a 2^18/2^20 proof start with zero fresh
# whole-transform executable loads after any smaller proof (the round-4
# per-(batch, n) whole-transform jits produced 58-227 MB executables whose
# per-rung loads ate the bench budget).
NCAP = int(os.environ.get("DISTAFF_NTT_CANON_MAX", 1 << 15))
CANON_ELEMS = int(os.environ.get("DISTAFF_NTT_CANON_ELEMS", 1 << 21))

assert TILE & (TILE - 1) == 0 and LEAF & (LEAF - 1) == 0
assert BTILE & (BTILE - 1) == 0
assert NCAP & (NCAP - 1) == 0 and CANON_ELEMS & (CANON_ELEMS - 1) == 0
assert NCAP >= LEAF and CANON_ELEMS >= NCAP

# DISTAFF_PALLAS_LEAF routes leaf transforms (>= 256 points) through the
# fused-in-VMEM Pallas kernel (ops/field_pallas.leaf_ntt_bm); values are
# bit-identical (tests/test_pallas.py).  "auto" (default): Pallas on real
# accelerators ONLY for small batches - the all-stages-in-VMEM kernel wins
# 3x at <= 32 lanes (KERNELS_r03) but the Mosaic-legal 128-lane blocks it
# needs for bigger batches spill scoped VMEM and run 6x SLOWER than the
# XLA stage loop (measured b=512 n=1024: 53 ms vs 8.8 ms on v5e).
# "1"/"0" force it on/off regardless.
_PALLAS_LEAF = os.environ.get("DISTAFF_PALLAS_LEAF", "auto")
_PALLAS_MAXB = int(os.environ.get("DISTAFF_PALLAS_MAXB", 32))


def _pallas_leaf_enabled(values):
    if _PALLAS_LEAF == "1":
        return True
    if _PALLAS_LEAF == "0":
        return False
    if values.shape[0] > _PALLAS_MAXB:
        return False
    try:
        return next(iter(values.devices())).platform != "cpu"
    except Exception:  # tracers / non-array inputs: stay on the XLA path
        return False


def _pad_rows(x, multiple):
    """Pad axis 0 of (n, ...) up to a multiple; returns (padded, n)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_shape = (rem,) + x.shape[1:]
    return jnp.concatenate([x, jnp.zeros(pad_shape, dtype=x.dtype)]), n


# ------------------------------------------------------------------------------------------------
# power series
# ------------------------------------------------------------------------------------------------

@jax.jit
def _ps_tile(base, prefix):
    """prefix * [base^0 .. base^(TILE-1)]: one fixed-shape kernel."""
    ps = fj.power_series_dev(base, TILE)
    return fj.mul(ps, jnp.broadcast_to(prefix, (TILE, 4)))


@jax.jit
def _ps_tiles_batched(base, prefixes):
    """prefixes[t] * [base^0 .. base^(TILE-1)] for every tile t in ONE
    dispatch: (T, 4) -> (T, TILE, 4).  Host->device transfers over the
    tunneled TPU cost ~25 ms EACH in latency; per-tile prefix constants
    made long power series latency-bound (measured 434 ms for 2^19 rows in
    8 tiles), so all prefixes arrive in one transfer instead."""
    ps = fj.power_series_dev(base, TILE)
    t = prefixes.shape[0]
    return fj.mul(jnp.broadcast_to(ps[None], (t, TILE, 4)), prefixes[:, None, :])


def power_series(x_int, n):
    """[x^0 .. x^(n-1)] as an (n, 4) device array via fixed-size tiles.

    The tile prefixes x^lo are host pow()s - the base is always host-known
    (roots of unity, transcript draws) - shipped as one (T, 4) transfer."""
    x_int = int(x_int) % M
    if n <= 0:
        return fj.zeros((0,))
    if n <= TILE:
        return _ps_tile(fj.constant(x_int), fj.constant(1))[:n]
    prefixes = np.array(
        [pow(x_int, lo, M) for lo in range(0, n, TILE)], dtype=object)
    out = _ps_tiles_batched(fj.constant(x_int), fj.from_ints(prefixes))
    return out.reshape(-1, 4)[:n]


# ------------------------------------------------------------------------------------------------
# pointwise helpers
# ------------------------------------------------------------------------------------------------

@jax.jit
def _scale_tile(x, c):
    return fj.mul(x, jnp.broadcast_to(c, x.shape))


def scale(values, c_int):
    """values * c (constant), tiled over axis 0 of an (n, 4) array."""
    padded, n = _pad_rows(values, TILE)
    c = fj.constant(int(c_int) % M)
    parts = [_scale_tile(padded[lo : lo + TILE], c)
             for lo in range(0, padded.shape[0], TILE)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return out[:n]


# ------------------------------------------------------------------------------------------------
# FRI fold
# ------------------------------------------------------------------------------------------------

@jax.jit
def _fold_tile(ys, x0, inv_x0_cubed, special_x):
    from .fri_jax import _fold_rows_impl
    return _fold_rows_impl(ys, x0, inv_x0_cubed, special_x)


def fold_rows(ys, x0, inv_x0_cubed, special_x):
    """ops.fri_jax.fold_rows with the row axis tiled: (q, 4, 4) x (q, 4)
    -> (q, 4) using one fixed (TILE, ...) kernel for every layer size of
    every proof.  Padding rows fold to garbage and are sliced off."""
    q = ys.shape[0]
    if q <= 0:
        return fj.zeros((0,))
    ys_p, _ = _pad_rows(ys, TILE)
    x0_p, _ = _pad_rows(x0, TILE)
    ix_p, _ = _pad_rows(inv_x0_cubed, TILE)
    parts = [_fold_tile(ys_p[lo : lo + TILE], x0_p[lo : lo + TILE],
                        ix_p[lo : lo + TILE], special_x)
             for lo in range(0, ys_p.shape[0], TILE)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return out[:q]


# ------------------------------------------------------------------------------------------------
# BLAKE3 row hashing
# ------------------------------------------------------------------------------------------------

def hash_rows(rows_u32, byte_len):
    """ops.blake3_jax.hash_rows_u32 with the row axis tiled; the kernel
    shape depends only on the row width (register count bucket), not on
    the domain size."""
    from .blake3_jax import hash_rows_u32
    padded, n = _pad_rows(rows_u32, TILE)
    parts = [hash_rows_u32(padded[lo : lo + TILE], byte_len)
             for lo in range(0, padded.shape[0], TILE)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return out[:n]


# ------------------------------------------------------------------------------------------------
# weighted register sums
# ------------------------------------------------------------------------------------------------

_RGROUP = 8  # registers per fixed group (zero-padded weights)


@jax.jit
def _wsum_tile(lde_tile, weights):
    """(RGROUP, TILE, 4) x (RGROUP, 4) -> (TILE, 4)."""
    products = fj.mul(lde_tile, weights[:, None, :])
    return fj.sum_reduce(products, axis=0)


def weighted_register_sum(lde, weights):
    """sum_i weights[i] * lde[i] over (R, D, 4): both axes tiled so one
    compiled kernel serves every register count and domain size."""
    r, d = lde.shape[0], lde.shape[1]
    parts = []
    for lo in range(0, d, TILE):
        width = min(TILE, d - lo)
        tile_total = None
        for rlo in range(0, r, _RGROUP):
            chunk = lde[rlo : rlo + _RGROUP, lo : lo + TILE]
            w = weights[rlo : rlo + _RGROUP]
            if chunk.shape[0] < _RGROUP:
                pad = _RGROUP - chunk.shape[0]
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad,) + chunk.shape[1:], dtype=jnp.uint32)])
                w = jnp.concatenate([w, jnp.zeros((pad, 4), dtype=jnp.uint32)])
            if chunk.shape[1] < TILE:
                pad = TILE - chunk.shape[1]
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((_RGROUP, pad, 4), dtype=jnp.uint32)], axis=1)
            part = _wsum_tile(chunk, w)
            tile_total = part if tile_total is None else fj.add(tile_total, part)
        parts.append(tile_total[:width])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


# ------------------------------------------------------------------------------------------------
# NTT: Bailey four-step recursion over fixed-size leaf kernels
# ------------------------------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2,))
def _leaf_ntt_tile(values, tw, n_leaf):
    """Natural-order NTT of size n_leaf along axis 1, batch axis 0
    (batch-MAJOR: the limb dim stays minor and the big batch dim major, the
    only 3D orientation whose standalone reshape/transpose programs get
    compact TPU layouts - a (n, 4, 4)-style tensor at a program boundary
    forces a copy into a T(8,128)-padded layout, measured 32x HBM at 2^18).

    values: (BTILE, n_leaf, 4); tw: (n_leaf/2, 4) power series of the
    size-n_leaf root.  n_leaf is drawn from the tiny set of powers of two
    <= LEAF, so these kernels compile a bounded number of times ever."""
    out = fj._ntt_stages_bm(values, tw)
    rev = fj._bitrev_indices(n_leaf)
    return out[:, rev]


def _leaf_ntt(values, root_int):
    """(B, n, 4) -> natural-order NTT along axis 1 for n <= LEAF, with the
    batch axis tiled (padded; extra rows transform to garbage and are
    sliced off).

    The batch tile scales inversely with the transform size so the tile
    element count - and the dispatch count - stays constant: the deepest
    recursion level has tiny transforms (n as small as 2) over a batch as
    large as the whole domain, and a fixed BTILE there issued tens of
    thousands of dispatches (measured 10x steady-state regression at 2^16
    traces).  One shape per leaf size keeps compiles bounded."""
    b, n = values.shape[0], values.shape[1]
    if n == 1:
        return values
    btile = BTILE * max(LEAF // n, 1)
    tw = power_series(root_int, n // 2)
    rem = (-b) % btile
    if rem:
        values = jnp.concatenate(
            [values, jnp.zeros((rem, n, 4), dtype=jnp.uint32)], axis=0)
    if n >= 256 and _pallas_leaf_enabled(values):
        # every stage of the transform fused in VMEM: one HBM read+write
        # for the whole leaf instead of one per butterfly stage
        from .field_pallas import leaf_ntt_bm
        parts = [
            leaf_ntt_bm(values[lo : lo + btile], tw)
            for lo in range(0, values.shape[0], btile)
        ]
    else:
        parts = [
            _leaf_ntt_tile(values[lo : lo + btile], tw, n)
            for lo in range(0, values.shape[0], btile)
        ]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return out[:b]


# twiddle tile geometry: (RGROUP_T k1-rows, LEAF j2-columns, BTWID batch)
_RGROUP_T = int(os.environ.get("DISTAFF_NTT_TGROUP", 64))
_BTWID = int(os.environ.get("DISTAFF_NTT_TBATCH", 8))
# _apply_twiddles relies on rg = min(_RGROUP_T, n1) dividing n1 (a power of
# two), and on btwid = _RGROUP_T*_BTWID/rg being integral
assert _RGROUP_T & (_RGROUP_T - 1) == 0 and _RGROUP_T > 0
assert _BTWID & (_BTWID - 1) == 0 and _BTWID > 0


@functools.partial(jax.jit, static_argnums=(3,))
def _twiddle_tile(block, bases, prefix, n2):
    """block: (BTWID, RGROUP_T, n2, 4) k1-rows in a group; multiply row r by
    the power series of (prefix * bases[r]) over j2 - i.e. by
    w^((lo + r) * j2) with bases[r] = w^r, prefix = w^lo."""
    rows = jax.vmap(lambda bx: fj.power_series_dev(bx, n2))(
        fj.mul(bases, jnp.broadcast_to(prefix, bases.shape)))  # (RG, n2, 4)
    return fj.mul(block, rows[None])


def _apply_twiddles(bv, root_int, n1, n2, b):
    """bv: (B, n1, n2, 4) with bv[b, k1, j2] *= w^(k1*j2); both the k1 and
    batch axes run in bounded-size tiles.  root_int = w, the size-(n1*n2)
    root.

    The tile geometry adapts to the recursion level while keeping the tile
    element count constant: rg = min(_RGROUP_T, n1) k1-rows per tile (n1 is
    a power of two, so rg always divides it - no row padding) and
    btwid = _RGROUP_T*_BTWID/rg batch rows.  rg ranges over a handful of
    powers of two, so the kernel still compiles a bounded number of times
    ever; padding n1 up to _RGROUP_T instead blew HBM at deep recursion
    levels (n1=2 with a 4096-wide batch wanted a 32x row expansion)."""
    w = int(root_int)
    rg = min(_RGROUP_T, n1)
    btwid = max(1, (_RGROUP_T * _BTWID) // rg)
    # never pad the batch axis BEYOND the next power of two of the actual
    # batch: padding b=1 up to btwid at a 2^25 transform materializes a
    # multi-GB zero tensor (measured 4 GB -> OOM at 2^20 traces); a smaller
    # power-of-two tile is one extra bounded compile instead
    btwid = min(btwid, 1 << max(b - 1, 0).bit_length())
    bases = fj.from_ints(
        np.array([pow(w, r, M) for r in range(rg)], dtype=object))
    # all row-group prefixes w^lo in ONE transfer (a per-group fj.constant
    # costs a tunnel round trip each; deep recursion levels have dozens of
    # groups) - sliced on device inside the loop
    prefixes = fj.from_ints(np.array(
        [pow(w, lo, M) for lo in range(0, n1, rg)], dtype=object))
    x = bv
    rem = (-b) % btwid
    if rem:
        x = jnp.concatenate(
            [x, jnp.zeros((rem,) + x.shape[1:], dtype=jnp.uint32)], axis=0)
    row_parts = []
    for gi, lo in enumerate(range(0, n1, rg)):
        prefix = prefixes[gi]
        cols = [
            _twiddle_tile(x[c : c + btwid, lo : lo + rg], bases, prefix, n2)
            for c in range(0, x.shape[0], btwid)
        ]
        row_parts.append(
            cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=0))
    out = (row_parts[0] if len(row_parts) == 1
           else jnp.concatenate(row_parts, axis=1))
    return out[:b]


# ------------------------------------------------------------------------------------------------
# canonical NTT kernels: one fixed-shape executable per transform SIZE
# ------------------------------------------------------------------------------------------------
#
# Twiddle tables are built once per (size, root) and cached as device
# arrays: rebuilding them per call cost b*n*log2(n2) multiplies per
# four-step level - MORE compute than the butterflies themselves - and the
# streaming 2^20 path repeats the same (1, 2^25) geometry ~27 times per
# proof.  The cache is LRU with a byte budget so huge tables can't starve
# HBM.

_TW_BUDGET = int(os.environ.get("DISTAFF_TWIDDLE_CACHE_BYTES", 1 << 30))
_tw_cache = collections.OrderedDict()
_tw_bytes = [0]


def _tw_get(key, build):
    hit = _tw_cache.pop(key, None)
    if hit is not None:
        _tw_cache[key] = hit
        return hit
    val = build()
    _tw_cache[key] = val
    _tw_bytes[0] += val.size * 4
    while _tw_bytes[0] > _TW_BUDGET and len(_tw_cache) > 1:
        _, old = _tw_cache.popitem(last=False)
        _tw_bytes[0] -= old.size * 4
    return val


def _stage_table(n, root_int):
    """Cached (levels, n/2, 4) Pease stage-twiddle table for size n."""
    def build():
        tw = power_series(root_int, n // 2)
        return fj._stage_twiddles(tw)
    return _tw_get(("stage", n, int(root_int)), build)


def _stage_table2(n, root_int):
    """Cached odd-stage half tables for the 2-level Pease kernel:
    Wh[k] = W[2k+1][::2] ((levels//2, n/4, 4)).  Stage s >= 1 repeats each
    twiddle 2^s times, so consecutive butterfly pairs share their twiddle
    and the fused double-stage only needs every other entry."""
    def build():
        return _stage_table(n, root_int)[1::2, ::2]
    return _tw_get(("stage2", n, int(root_int)), build)


_TGROUP_BUILD = 64


@functools.partial(jax.jit, static_argnums=(1,))
def _twiddle_rows_tile(bases, n2):
    """(G, 4) bases -> (G, n2, 4) rows of power series (table builder)."""
    return jax.vmap(lambda bx: fj.power_series_dev(bx, n2))(bases)


def _four_step_table(n1, n2, root_int):
    """Cached (n1, n2, 4) table of w^(k1*j2) for the four-step twiddle."""
    def build():
        w = int(root_int)
        parts = []
        for lo in range(0, n1, _TGROUP_BUILD):
            rows = min(_TGROUP_BUILD, n1 - lo)
            ints = [pow(w, k1, M) for k1 in range(lo, lo + rows)]
            ints += [0] * (_TGROUP_BUILD - rows)
            bases = fj.from_ints(np.array(ints, dtype=object))
            parts.append(_twiddle_rows_tile(bases, n2)[:rows])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return _tw_get(("four", n1, n2, int(root_int)), build)


def _bitrev_bm(x, n):
    """Bit-reversal along axis 1 of (B, n, 4) without one big gather: for
    n > 1024 split the index bits (two small row gathers + one transpose,
    the batch-major analogue of field_jax._bitrev_permute)."""
    if n <= 1024:
        return x[:, jnp.asarray(fj._bitrev_indices(n))]
    bits = n.bit_length() - 1
    a_bits = bits // 2
    a, bb = 1 << a_bits, n >> a_bits
    y = x.reshape(x.shape[0], a, bb, 4)
    y = y[:, jnp.asarray(fj._bitrev_indices(a))]
    y = y[:, :, jnp.asarray(fj._bitrev_indices(bb))]
    return y.transpose(0, 2, 1, 3).reshape(x.shape[0], n, 4)


@functools.partial(jax.jit, static_argnums=(2,))
def _pease_tile(values, W, n):
    """Natural-order NTT of size n along axis 1 of a (CB, n, 4) tile with a
    PREBUILT stage table W ((levels, n/2, 4)).  W is a runtime argument, so
    one executable per n serves every root (forward and inverse) and every
    trace geometry."""
    b = values.shape[0]
    levels = n.bit_length() - 1

    def body(s, x):
        a = x[:, : n // 2]
        c = x[:, n // 2 :]
        w = jax.lax.dynamic_index_in_dim(W, s, axis=0, keepdims=False)[None]
        even = fj.add(a, c)
        odd = fj.mul(fj.sub(a, c), jnp.broadcast_to(w, a.shape))
        return jnp.stack([even, odd], axis=2).reshape(b, n, 4)

    out = jax.lax.fori_loop(0, levels, body, values)
    return _bitrev_bm(out, n)


@functools.partial(jax.jit, static_argnums=(3,))
def _pease_tile2(values, W, Wh, n):
    """_pease_tile with TWO butterfly stages fused per loop iteration: same
    multiply count, but one HBM read+write of the tile per stage PAIR
    instead of per stage, and half the loop iterations.

    Stage s produces y = interleave(even, odd); stage s+1's butterflies on
    y reduce to halves of even/odd directly (y[:n/2] interleaves their
    first halves, y[n/2:] their second halves), so y is never materialized:
        z[4j]   = even[j] + even[n/4+j]
        z[4j+1] = (even[j] - even[n/4+j]) * Wh[j]
        z[4j+2] = odd[j] + odd[n/4+j]
        z[4j+3] = (odd[j] - odd[n/4+j]) * Wh[j]
    with Wh[j] = W[s+1][2j] (= W[s+1][2j+1]: stage >= 1 twiddles repeat in
    pairs).  Bit-identical to two _pease_tile stages."""
    b = values.shape[0]
    levels = n.bit_length() - 1

    def body2(k, x):
        a = x[:, : n // 2]
        c = x[:, n // 2 :]
        w0 = jax.lax.dynamic_index_in_dim(W, 2 * k, axis=0, keepdims=False)[None]
        even = fj.add(a, c)
        odd = fj.mul(fj.sub(a, c), jnp.broadcast_to(w0, a.shape))
        e_lo, e_hi = even[:, : n // 4], even[:, n // 4 :]
        o_lo, o_hi = odd[:, : n // 4], odd[:, n // 4 :]
        wh = jax.lax.dynamic_index_in_dim(Wh, k, axis=0, keepdims=False)[None]
        whb = jnp.broadcast_to(wh, e_lo.shape)
        z0 = fj.add(e_lo, e_hi)
        z1 = fj.mul(fj.sub(e_lo, e_hi), whb)
        z2 = fj.add(o_lo, o_hi)
        z3 = fj.mul(fj.sub(o_lo, o_hi), whb)
        return jnp.stack([z0, z1, z2, z3], axis=2).reshape(b, n, 4)

    out = jax.lax.fori_loop(0, levels // 2, body2, values)
    if levels % 2:
        a = out[:, : n // 2]
        c = out[:, n // 2 :]
        w = W[levels - 1][None]
        even = fj.add(a, c)
        odd = fj.mul(fj.sub(a, c), jnp.broadcast_to(w, a.shape))
        out = jnp.stack([even, odd], axis=2).reshape(b, n, 4)
    return _bitrev_bm(out, n)


def _canon_ntt(values, root_int):
    """(B, n, 4) -> natural-order NTT along axis 1 for n <= NCAP: the batch
    is padded to the canonical tile CB(n) = CANON_ELEMS/n, so the kernel is
    keyed by n alone."""
    b, n = values.shape[0], values.shape[1]
    if n == 1:
        return values
    cb = max(1, CANON_ELEMS // n)
    rem = (-b) % cb
    if rem:
        values = jnp.concatenate(
            [values, jnp.zeros((rem, n, 4), dtype=jnp.uint32)], axis=0)
    if 256 <= n <= LEAF and _pallas_leaf_enabled(values):
        from .field_pallas import leaf_ntt_bm
        tw = power_series(root_int, n // 2)
        parts = [leaf_ntt_bm(values[lo : lo + cb], tw)
                 for lo in range(0, values.shape[0], cb)]
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return out[:b]
    W = _stage_table(n, root_int)
    if n >= 4:  # 2-level fused kernel (n=2 has a single stage)
        Wh = _stage_table2(n, root_int)
        parts = [_pease_tile2(values[lo : lo + cb], W, Wh, n)
                 for lo in range(0, values.shape[0], cb)]
    else:
        parts = [_pease_tile(values[lo : lo + cb], W, n)
                 for lo in range(0, values.shape[0], cb)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return out[:b]


def ntt_batched(values, root_int):
    b, n = values.shape[0], values.shape[1]
    root_int = int(root_int)
    if isinstance(values, jax.core.Tracer):
        # under tracing (mesh stages, dryrun graphs) concrete cached tables
        # would embed as giant graph constants; the inline-twiddle recursion
        # stays fully traceable
        return _ntt_batched_inline(values, root_int)
    return _ntt_batched_impl(values, root_int)


def _ntt_batched_impl(values, root_int):
    """Natural-order NTT of size n along axis 1 of (B, n, 4), batched over
    the MAJOR axis 0, built entirely from canonical fixed-shape kernels.

    Bailey four-step (reference src/math/fft.rs is the radix-2 recursion
    this replaces): sizes <= NCAP dispatch straight to the per-size Pease
    kernel; larger sizes split n = n1 * n2 with n2 = NCAP - row transforms
    ride the canonical kernels, the twiddle w^(k1*j2) is ONE elementwise
    multiply by the cached table, and the size-n1 column transforms recurse
    (n1 <= 2^10 for every production geometry up to 2^25).

    The batch-MAJOR orientation is load-bearing for HBM: every inter-kernel
    reshape here regroups major axes (or transposes two large axes) with
    the limb dim pinned minor, which XLA lowers with compact layouts.  The
    former batch-minor layout created (n, smallB, 4) boundary tensors whose
    standalone reshape programs forced copies into T(8,128)-padded layouts
    (measured 32x HBM expansion -> OOM at 2^18 traces)."""
    b, n = values.shape[0], values.shape[1]
    root_int = int(root_int)
    if n <= NCAP:
        return _canon_ntt(values, root_int)

    n2 = NCAP
    n1 = n // n2

    # split k = k2*n1 + k1: a2[b, k2, k1] = a[b, k2*n1 + k1]
    a2 = values.reshape(b, n2, n1, 4)
    t = a2.transpose(0, 2, 1, 3)                      # [b, k1, k2]
    bv = _canon_ntt(t.reshape(b * n1, n2, 4),
                    pow(root_int, n1, M))             # NTT over k2 -> j2
    bv = bv.reshape(b, n1, n2, 4)                     # [b, k1, j2]
    tw4 = _four_step_table(n1, n2, root_int)
    bv = fj.mul(bv, tw4[None])                        # *= w^(k1*j2)

    cin = bv.transpose(0, 2, 1, 3).reshape(b * n2, n1, 4)  # [b, j2, k1]
    c = _ntt_batched_impl(cin, pow(root_int, n2, M))  # size-n1 -> [b, j2, j1]
    return (c.reshape(b, n2, n1, 4).transpose(0, 2, 1, 3)  # [b, j1, j2]
            .reshape(b, n, 4))                        # j = j1*n2 + j2


def _ntt_batched_inline(values, root_int):
    """Traced-fallback four-step recursion with inline twiddles (no cached
    device tables): same field values as _ntt_batched_impl."""
    b, n = values.shape[0], values.shape[1]
    root_int = int(root_int)
    if n <= LEAF:
        return _leaf_ntt(values, root_int)

    n2 = LEAF
    n1 = n // n2

    a2 = values.reshape(b, n2, n1, 4)
    t = a2.transpose(0, 2, 1, 3)                      # [b, k1, k2]
    bv = _leaf_ntt(t.reshape(b * n1, n2, 4),
                   pow(root_int, n1, M))              # NTT over k2 -> j2
    bv = bv.reshape(b, n1, n2, 4)                     # [b, k1, j2]
    bv = _apply_twiddles(bv, root_int, n1, n2, b)     # *= w^(k1*j2)

    cin = bv.transpose(0, 2, 1, 3).reshape(b * n2, n1, 4)  # [b, j2, k1]
    c = _ntt_batched_inline(cin, pow(root_int, n2, M))
    return (c.reshape(b, n2, n1, 4).transpose(0, 2, 1, 3)  # [b, j1, j2]
            .reshape(b, n, 4))                        # j = j1*n2 + j2


def warm_kernels():
    """Dispatch every canonical NTT kernel once on tiny data so a fresh
    process pays all executable loads up front (ideally overlapping the
    one-time TPU bring-up), and a proof at ANY trace geometry afterwards
    loads no new transform executables.  Enqueues asynchronously; callers
    that need a completion fence should fetch a result themselves."""
    n = 2
    while n <= NCAP:
        root = hostfield.get_root_of_unity(n)
        _canon_ntt(jnp.zeros((1, n, 4), dtype=jnp.uint32), root)
        n <<= 1
    _twiddle_rows_tile(
        jnp.zeros((_TGROUP_BUILD, 4), dtype=jnp.uint32), NCAP)
    _suf_tile(jnp.zeros((TILE, 4), dtype=jnp.uint32))


# ------------------------------------------------------------------------------------------------
# suffix sums (constraint-polynomial synthetic divisions)
# ------------------------------------------------------------------------------------------------

@jax.jit
def _suf_tile(x):
    """Inclusive suffix sums within one (TILE, 4) tile."""
    return jnp.flip(fj.cumsum(jnp.flip(x, axis=0), axis=0), axis=0)


def suffix_sums(w):
    """Inclusive modular suffix sums over axis 0 of (n, 4): fixed-shape
    per-tile scans plus a tiny cross-tile combine, replacing the former
    whole-domain associative scan whose per-geometry executables reached
    123 MB (a fresh load per trace size)."""
    n = w.shape[0]
    padded, _ = _pad_rows(w, TILE)       # trailing zero rows leave suffix sums unchanged
    nt = padded.shape[0] // TILE
    parts = [_suf_tile(padded[lo : lo + TILE])
             for lo in range(0, padded.shape[0], TILE)]
    if nt == 1:
        return parts[0][:n]
    totals = jnp.stack([p[0] for p in parts])                  # (nt, 4)
    suf_tot = jnp.flip(fj.cumsum(jnp.flip(totals, axis=0), axis=0), axis=0)
    after = jnp.concatenate(
        [suf_tot[1:], jnp.zeros((1, 4), dtype=jnp.uint32)])    # (nt, 4)
    out = [fj.add(parts[t], jnp.broadcast_to(after[t], (TILE, 4)))
           for t in range(nt)]
    return jnp.concatenate(out)[:n]


def ntt(values, root_int=None):
    """Drop-in for field_jax.ntt: (n, 4) coefficient vector -> evaluations,
    natural order, fixed-shape kernels only."""
    n = values.shape[0]
    if n == 1:
        return values
    if root_int is None:
        root_int = hostfield.get_root_of_unity(n)
    return ntt_batched(values[None], int(root_int))[0]


def intt_batched(values, root_int=None):
    """Inverse NTT along axis 1 of (B, n, 4): forward transform with the
    inverse root, scaled by 1/n."""
    n = values.shape[1]
    if n == 1:
        return values
    if root_int is None:
        root_int = hostfield.get_root_of_unity(n)
    inv_root = pow(int(root_int), n - 1, M)
    out = ntt_batched(values, inv_root)
    inv_n = hostfield.inv(n)
    shape = out.shape
    return scale(out.reshape(-1, 4), inv_n).reshape(shape)


def intt(values, root_int=None):
    n = values.shape[0]
    if n == 1:
        return values
    return intt_batched(values[None], root_int)[0]
