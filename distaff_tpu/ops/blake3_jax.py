"""Device-side BLAKE3 leaf hashing for Merkle commitments.

Hashing trace rows on the TPU reduces the device->host transfer for the
trace commitment from R*16 bytes per row to the 32-byte digest per leaf
(10x+ for wide traces), and keeps the bandwidth-heavy part of the Merkle
stage on the device.

The compression function unrolls the 7 rounds over 16 SSA lane arrays
with the per-round message schedule precomputed as composed-permutation
index tables resolved at trace time (round 5; the earlier fori_loop over
a (16, N) state tensor made every G-function lane write a full-state
copy and left the kernel HBM-bound at ~1% of compute speed-of-light).

Messages up to two chunks (<= 2048 bytes = 128 registers) ride this fast
path; wider traces fall back to the host implementation.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.blake3 import _IV, _PERM, CHUNK_START, CHUNK_END, ROOT, PARENT

# composed permutations: round r reads message word j from PERMS[r][j]
_PERMS = np.zeros((7, 16), dtype=np.int32)
_PERMS[0] = np.arange(16)
for _r in range(1, 7):
    _PERMS[_r] = _PERMS[_r - 1][list(_PERM)]


def _g4(sa, sb, sc, sd, mx, my):
    """One G mixing function over four independent lane arrays (SSA form:
    no (16, N) state tensor, so XLA never materializes whole-state copies
    - the former s.at[i].set() formulation made each of the 32 per-round
    lane writes a full-state copy and left the kernel HBM-bound)."""
    sa = sa + sb + mx
    sd = sd ^ sa
    sd = (sd >> 16) | (sd << 16)
    sc = sc + sd
    sb = sb ^ sc
    sb = (sb >> 12) | (sb << 20)
    sa = sa + sb + my
    sd = sd ^ sa
    sd = (sd >> 8) | (sd << 24)
    sc = sc + sd
    sb = sb ^ sc
    sb = (sb >> 7) | (sb << 25)
    return sa, sb, sc, sd


_COLS = ((0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
         (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))


def _compress(cv, m_stack, block_len, flags, counter=0):
    """cv: (8, N); m_stack: (16, N) message words -> new cv (8, N).
    `counter` is the 64-bit chunk counter (t) - nonzero for the second and
    later chunks of multi-chunk (> 1024-byte) messages.

    The round loop carries the 16 state words as a TUPLE of lane arrays
    (SSA form) and permutes the message words with ONE 16-row gather per
    round (a transient (16, N) temp XLA reuses across iterations; a
    pre-permuted (7, 16, N) tensor would have to live across the whole
    loop - 15 GB at the streaming path's 2^25-row domains).  Fully
    unrolling the rounds instead explodes XLA compile time (measured: a
    one-block hash did not compile in 100 s on CPU), and a (16, N) state
    tensor with s.at[i].set() lane writes makes every G-function write a
    full-state copy (32 copies/round)."""
    n = cv.shape[1]
    s0 = tuple(cv[i] for i in range(8)) + tuple(
        jnp.full((n,), iv, dtype=jnp.uint32) for iv in _IV[:4]) + (
        jnp.full((n,), counter & 0xFFFFFFFF, dtype=jnp.uint32),
        jnp.full((n,), (counter >> 32) & 0xFFFFFFFF, dtype=jnp.uint32),
        jnp.full((n,), block_len, dtype=jnp.uint32),
        jnp.full((n,), flags, dtype=jnp.uint32),
    )
    perm_table = jnp.asarray(_PERMS)

    def round_body(r, s):
        m = m_stack[jax.lax.dynamic_index_in_dim(
            perm_table, r, axis=0, keepdims=False)]          # (16, N)
        s = list(s)
        for gi, (a, b, c, d) in enumerate(_COLS):
            s[a], s[b], s[c], s[d] = _g4(
                s[a], s[b], s[c], s[d], m[2 * gi], m[2 * gi + 1])
        return tuple(s)

    s = jax.lax.fori_loop(0, 7, round_body, s0)
    return jnp.stack([s[i] ^ s[i + 8] for i in range(8)])


@functools.partial(jax.jit, static_argnums=(1,))
def hash_rows_u32(rows_u32, byte_len):
    """BLAKE3 of N equal-length single-chunk messages given as u32 words.

    rows_u32: (N, W) uint32 little-endian message words (W = byte_len/4).
    Returns (N, 8) uint32 digests.  Chunk counter is 0 (single chunk).
    """
    assert byte_len <= 2048, "device path handles <= 2-chunk messages"
    assert byte_len % 4 == 0
    n, w = rows_u32.shape
    assert w * 4 == byte_len

    nblocks = max((byte_len + 63) // 64, 1)
    padded_w = nblocks * 16
    if w < padded_w:
        rows_u32 = jnp.concatenate(
            [rows_u32, jnp.zeros((n, padded_w - w), dtype=jnp.uint32)], axis=1)

    nchunks = (nblocks + 15) // 16
    chunk_cvs = []
    for c in range(nchunks):
        blocks = range(c * 16, min((c + 1) * 16, nblocks))
        cv = jnp.stack([jnp.full((n,), iv, dtype=jnp.uint32) for iv in _IV])
        for i in blocks:
            m_stack = rows_u32[:, i * 16 : (i + 1) * 16].T  # (16, N)
            flags = 0
            if i == c * 16:
                flags |= CHUNK_START
            if i == min((c + 1) * 16, nblocks) - 1:
                flags |= CHUNK_END
                if nchunks == 1:
                    flags |= ROOT
            blen = 64 if i < nblocks - 1 else byte_len - 64 * (nblocks - 1)
            cv = _compress(cv, m_stack, blen, flags, counter=c)
        chunk_cvs.append(cv)
    if nchunks == 1:
        return chunk_cvs[0].T
    return parent_root(chunk_cvs[0], chunk_cvs[1]).T  # (N, 8)


def parent_root(cv0, cv1):
    """Combine two chunk chaining values into the root digest of a 2-chunk
    message (BLAKE3 parent node, counter 0): cv0 || cv1 is the 64-byte
    parent block."""
    n = cv0.shape[1]
    m_stack = jnp.concatenate([cv0, cv1], axis=0)       # (16, N)
    iv_cv = jnp.stack([jnp.full((n,), iv, dtype=jnp.uint32) for iv in _IV])
    return _compress(iv_cv, m_stack, 64, PARENT | ROOT)


# ------------------------------------------------------------------------------------------------
# incremental row hashing: absorb the trace row bytes 64-byte block by
# 64-byte block (4 registers each), so the full (R, D, 4) LDE never has to
# be resident - the streaming-LDE path at 2^20 domains feeds register
# chunks straight from the NTT into the hash state
# ------------------------------------------------------------------------------------------------

def absorb_begin(n):
    """Fresh per-row BLAKE3 chaining values: (8, N) uint32."""
    return jnp.stack([jnp.full((n,), iv, dtype=jnp.uint32) for iv in _IV])


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def absorb_block(cv, r0, r1, r2, r3, first_in_chunk, last_in_chunk, root,
                 blen, counter):
    """One 64-byte block per row: 4 registers' limbs for every domain row.

    cv: (8, D) chaining values; r0..r3: (D, 4) uint32 limb arrays (register
    k's u128 LE words are message words 4k..4k+3).  The registers arrive as
    four separate 2D operands on purpose: any (4, D, 4) / (D, 4, 4)-shaped
    tensor at a program boundary gets a T(8,128)-padded layout copy (32x
    HBM -> OOM at 2^25 domains).  `counter` is the chunk index (rows wider
    than 64 registers span two 1024-byte chunks); `root` is set only on the
    final block of single-chunk rows - two-chunk rows get ROOT in the
    parent combine (parent_root)."""
    m_stack = jnp.stack(
        [r[:, l] for r in (r0, r1, r2, r3) for l in range(4)])  # (16, D)
    flags = 0
    if first_in_chunk:
        flags |= CHUNK_START
    if last_in_chunk:
        flags |= CHUNK_END
    if root:
        flags |= ROOT
    return _compress(cv, m_stack, blen, flags, counter=counter)


def absorb_finish(cv):
    """(8, D) chaining values -> (D, 8) uint32 digests."""
    return cv.T


def hash_trace_rows_dev(lde_dev):
    """(R, D, 4) limb LDE -> (D, 8) uint32 leaf digests, kept on device.

    The row byte layout is the transposed limb array: uint32 limbs in
    little-endian order are the u128 LE serialization the reference hashes.
    Returns None only for rows beyond the device hasher's 2-chunk limit
    (> 128 registers cannot occur: MAX_REGISTER_COUNT).
    """
    r, d, _ = lde_dev.shape
    byte_len = r * 16
    if byte_len > 2048:
        return None
    from . import tiles

    # tile the domain axis so the transpose temporary stays bounded (a full
    # (R, D, 4) -> (D, R*4) transpose at a 2^25 domain is a multi-GB copy)
    parts = []
    for lo in range(0, d, tiles.TILE):
        width = min(tiles.TILE, d - lo)
        chunk = jax.lax.dynamic_slice_in_dim(lde_dev, lo, width, axis=1)
        if width < tiles.TILE:  # pad so the kernel shape stays fixed
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((r, tiles.TILE - width, 4), dtype=jnp.uint32)],
                axis=1)
        rows = jnp.transpose(chunk, (1, 0, 2)).reshape(tiles.TILE, r * 4)
        parts.append(hash_rows_u32(rows, byte_len)[:width])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def hash_trace_rows(lde_dev):
    """(R, D, 4) limb LDE -> (D, 32) uint8 leaf digests (host numpy)."""
    digests = hash_trace_rows_dev(lde_dev)
    if digests is None:
        return None
    d = lde_dev.shape[1]
    return np.ascontiguousarray(np.asarray(digests)).view(np.uint8).reshape(d, 32)
