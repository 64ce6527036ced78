"""BLAKE3 hash, implemented from the public specification.

The reference uses blake3 as its default (and only serializable) proof hash
function (reference src/stark/options.rs:84-92, src/crypto/hash.rs:205-209),
so a bit-exact implementation is required for transcript and Merkle
compatibility.  No blake3 package ships in this environment, so this module
implements the algorithm directly:

- ``blake3(data)``          - scalar hash of one message (any length)
- ``blake3_batch(arr)``     - numpy-vectorized hash of N equal-length messages
                              (the Merkle/leaf hashing hot path); the same
                              compression kernel is reusable with jax.numpy.

Only the plain (unkeyed) mode is implemented; that is all the protocol uses.
"""

import numpy as np

_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)

_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

CHUNK_START = 1
CHUNK_END = 2
PARENT = 4
ROOT = 8

_MASK = 0xFFFFFFFF
_CHUNK_LEN = 1024
_BLOCK_LEN = 64


def _rotr(x, n):
    return ((x >> n) | (x << (32 - n))) & _MASK


def _g(s, a, b, c, d, mx, my):
    s[a] = (s[a] + s[b] + mx) & _MASK
    s[d] = _rotr(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & _MASK
    s[b] = _rotr(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b] + my) & _MASK
    s[d] = _rotr(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & _MASK
    s[b] = _rotr(s[b] ^ s[c], 7)


def _compress(cv, block_words, counter, block_len, flags):
    s = list(cv) + list(_IV[:4]) + [
        counter & _MASK, (counter >> 32) & _MASK, block_len, flags,
    ]
    m = list(block_words)
    for r in range(7):
        _g(s, 0, 4, 8, 12, m[0], m[1])
        _g(s, 1, 5, 9, 13, m[2], m[3])
        _g(s, 2, 6, 10, 14, m[4], m[5])
        _g(s, 3, 7, 11, 15, m[6], m[7])
        _g(s, 0, 5, 10, 15, m[8], m[9])
        _g(s, 1, 6, 11, 12, m[10], m[11])
        _g(s, 2, 7, 8, 13, m[12], m[13])
        _g(s, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[p] for p in _PERM]
    return [s[i] ^ s[i + 8] for i in range(8)]


def _words_of(block: bytes):
    return [int.from_bytes(block[i : i + 4], "little") for i in range(0, 64, 4)]


def _chunk_cv(chunk: bytes, chunk_index: int, is_root: bool):
    cv = list(_IV)
    blocks = [chunk[i : i + _BLOCK_LEN] for i in range(0, max(len(chunk), 1), _BLOCK_LEN)]
    if not blocks:
        blocks = [b""]
    for i, block in enumerate(blocks):
        flags = 0
        if i == 0:
            flags |= CHUNK_START
        if i == len(blocks) - 1:
            flags |= CHUNK_END
            if is_root:
                flags |= ROOT
        padded = block + b"\x00" * (_BLOCK_LEN - len(block))
        cv = _compress(cv, _words_of(padded), chunk_index, len(block), flags)
    return cv


def _tree_cv(chunks, first_index, is_root):
    if len(chunks) == 1:
        return _chunk_cv(chunks[0], first_index, is_root)
    # left subtree takes the largest power-of-two chunk count < total
    left_n = 1 << (len(chunks) - 1).bit_length() - 1
    left = _tree_cv(chunks[:left_n], first_index, False)
    right = _tree_cv(chunks[left_n:], first_index + left_n, False)
    flags = PARENT | (ROOT if is_root else 0)
    return _compress(list(_IV), left + right, 0, _BLOCK_LEN, flags)


def blake3(data: bytes) -> bytes:
    """32-byte BLAKE3 digest of `data`."""
    chunks = [data[i : i + _CHUNK_LEN] for i in range(0, max(len(data), 1), _CHUNK_LEN)]
    if not chunks:
        chunks = [b""]
    cv = _tree_cv(chunks, 0, True)
    return b"".join(w.to_bytes(4, "little") for w in cv)


# ------------------------------------------------------------------------------------------------
# batched implementation (numpy by default; pass xp=jax.numpy for on-device hashing)
# ------------------------------------------------------------------------------------------------

def _rotr_v(xp, x, n):
    return (x >> n) | (x << (32 - n))


def _g_v(xp, s, a, b, c, d, mx, my):
    s[a] = s[a] + s[b] + mx
    s[d] = _rotr_v(xp, s[d] ^ s[a], 16)
    s[c] = s[c] + s[d]
    s[b] = _rotr_v(xp, s[b] ^ s[c], 12)
    s[a] = s[a] + s[b] + my
    s[d] = _rotr_v(xp, s[d] ^ s[a], 8)
    s[c] = s[c] + s[d]
    s[b] = _rotr_v(xp, s[b] ^ s[c], 7)


def compress_batch(xp, cv, m, counter, block_len, flags):
    """Vectorized compress: cv is a list of 8 (N,) u32 arrays, m a list of 16.

    counter/block_len/flags are Python ints (same for the whole batch).
    Returns the 8 output chaining-value arrays.
    """
    u32 = xp.uint32
    n = cv[0].shape
    s = list(cv) + [xp.full(n, w, dtype=u32) for w in _IV[:4]] + [
        xp.full(n, counter & _MASK, dtype=u32),
        xp.full(n, (counter >> 32) & _MASK, dtype=u32),
        xp.full(n, block_len, dtype=u32),
        xp.full(n, flags, dtype=u32),
    ]
    for r in range(7):
        _g_v(xp, s, 0, 4, 8, 12, m[0], m[1])
        _g_v(xp, s, 1, 5, 9, 13, m[2], m[3])
        _g_v(xp, s, 2, 6, 10, 14, m[4], m[5])
        _g_v(xp, s, 3, 7, 11, 15, m[6], m[7])
        _g_v(xp, s, 0, 5, 10, 15, m[8], m[9])
        _g_v(xp, s, 1, 6, 11, 12, m[10], m[11])
        _g_v(xp, s, 2, 7, 8, 13, m[12], m[13])
        _g_v(xp, s, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[p] for p in _PERM]
    return [s[i] ^ s[i + 8] for i in range(8)]


def blake3_batch(data: np.ndarray) -> np.ndarray:
    """Hash N equal-length messages at once: (N, L) uint8 -> (N, 32) uint8.

    Dispatches to the native OpenMP implementation when built
    (native/libdistaff_native.so); otherwise uses the numpy-vectorized path.
    """
    from .. import native
    if native.available():
        return native.blake3_batch(data)
    return _blake3_batch_numpy(data)


def _blake3_batch_numpy(data: np.ndarray) -> np.ndarray:
    """Numpy fallback: vectorized across messages, sequential over blocks."""
    xp = np
    n, length = data.shape
    chunk_bounds = list(range(0, max(length, 1), _CHUNK_LEN))
    num_chunks = len(chunk_bounds)

    def chunk_cvs(start, chunk_index, is_root):
        chunk = data[:, start : start + _CHUNK_LEN]
        clen = chunk.shape[1]
        cv = [xp.full((n,), w, dtype=xp.uint32) for w in _IV]
        nblocks = max((clen + _BLOCK_LEN - 1) // _BLOCK_LEN, 1)
        for i in range(nblocks):
            block = chunk[:, i * _BLOCK_LEN : (i + 1) * _BLOCK_LEN]
            blen = block.shape[1]
            if blen < _BLOCK_LEN:
                block = xp.concatenate(
                    [block, xp.zeros((n, _BLOCK_LEN - blen), dtype=xp.uint8)], axis=1
                )
            words = block.reshape(n, 16, 4).astype(xp.uint32)
            m = [
                words[:, w, 0]
                | (words[:, w, 1] << 8)
                | (words[:, w, 2] << 16)
                | (words[:, w, 3] << 24)
                for w in range(16)
            ]
            flags = 0
            if i == 0:
                flags |= CHUNK_START
            if i == nblocks - 1:
                flags |= CHUNK_END
                if is_root:
                    flags |= ROOT
            cv = compress_batch(xp, cv, m, chunk_index, blen, flags)
        return cv

    def tree(lo, hi, is_root):
        if hi - lo == 1:
            return chunk_cvs(chunk_bounds[lo], lo, is_root)
        left_n = 1 << (hi - lo - 1).bit_length() - 1
        left = tree(lo, lo + left_n, False)
        right = tree(lo + left_n, hi, False)
        flags = PARENT | (ROOT if is_root else 0)
        iv = [xp.full((n,), w, dtype=xp.uint32) for w in _IV]
        return compress_batch(xp, iv, left + right, 0, _BLOCK_LEN, flags)

    cv = tree(0, num_chunks, True)
    out = xp.empty((n, 32), dtype=xp.uint8)
    for i, w in enumerate(cv):
        out[:, i * 4] = (w & 0xFF).astype(xp.uint8)
        out[:, i * 4 + 1] = ((w >> 8) & 0xFF).astype(xp.uint8)
        out[:, i * 4 + 2] = ((w >> 16) & 0xFF).astype(xp.uint8)
        out[:, i * 4 + 3] = ((w >> 24) & 0xFF).astype(xp.uint8)
    return out
