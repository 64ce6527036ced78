"""Device-side BLAKE3 leaf hashing for Merkle commitments.

Hashing trace rows on the TPU reduces the device->host transfer for the
trace commitment from R*16 bytes per row to the 32-byte digest per leaf
(10x+ for wide traces), and keeps the bandwidth-heavy part of the Merkle
stage on the device.  Reuses the backend-agnostic compression kernel from
distaff_tpu.crypto.blake3 with jax.numpy as the array namespace.

Only single-chunk messages (<= 1024 bytes = 64 registers) need the fast
path; wider traces fall back to the host implementation.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.blake3 import compress_batch, CHUNK_START, CHUNK_END, ROOT, _IV


@functools.partial(jax.jit, static_argnums=(1,))
def hash_rows_u32(rows_u32, byte_len):
    """BLAKE3 of N equal-length single-chunk messages given as u32 words.

    rows_u32: (N, W) uint32 little-endian message words (W = byte_len/4).
    Returns (N, 8) uint32 digests.
    """
    assert byte_len <= 1024, "device path handles single-chunk messages only"
    assert byte_len % 4 == 0
    n, w = rows_u32.shape
    assert w * 4 == byte_len

    nblocks = max((byte_len + 63) // 64, 1)
    # zero-pad to a whole number of 64-byte blocks
    padded_w = nblocks * 16
    if w < padded_w:
        rows_u32 = jnp.concatenate(
            [rows_u32, jnp.zeros((n, padded_w - w), dtype=jnp.uint32)], axis=1)

    cv = [jnp.full((n,), iv, dtype=jnp.uint32) for iv in _IV]
    for i in range(nblocks):
        block = rows_u32[:, i * 16 : (i + 1) * 16]
        m = [block[:, j] for j in range(16)]
        flags = 0
        if i == 0:
            flags |= CHUNK_START
        if i == nblocks - 1:
            flags |= CHUNK_END | ROOT
        blen = 64 if i < nblocks - 1 else byte_len - 64 * (nblocks - 1)
        cv = compress_batch(jnp, cv, m, 0, blen, flags)
    return jnp.stack(cv, axis=1)


def hash_trace_rows(lde_dev):
    """(R, D, 4) limb LDE -> (D, 32) uint8 leaf digests (host numpy).

    The row byte layout is the transposed limb array: uint32 limbs in
    little-endian order are the u128 LE serialization the reference hashes.
    """
    r, d, _ = lde_dev.shape
    byte_len = r * 16
    if byte_len > 1024:
        return None  # fall back to host hashing for very wide traces
    rows = jnp.transpose(lde_dev, (1, 0, 2)).reshape(d, r * 4)
    digests = hash_rows_u32(rows, byte_len)
    return np.ascontiguousarray(np.asarray(digests)).view(np.uint8).reshape(d, 32)
