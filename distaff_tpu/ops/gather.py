"""Bucketed device row gathers.

Query openings gather a transcript-dependent number of rows (Merkle batch
proofs dedupe shared nodes, so the index count varies from proof to proof).
An eager gather specializes the compiled kernel on the index-vector length,
which would trigger a fresh XLA compile per proof over the tunneled compile
path.  Padding the index vector to a fixed bucket keeps one compile per
(array shape, bucket) and costs only a few wasted gather rows.
"""

import numpy as np
import jax.numpy as jnp

_BUCKET = 64


def gather_rows_dev(arr, indexes, axis=0):
    """Bucket-padded DEVICE gather: enqueues jnp.take and returns
    (device_rows, k) WITHOUT synchronizing - callers drain the transfer
    later (ops.hostsync.TransferBatch overlaps many at once; the former
    synchronous np.asarray here made every 'async' opening block a ~20 ms
    tunnel round trip at enqueue time).  Rows beyond k are pad garbage and
    must be trimmed after the host copy."""
    k = len(indexes)
    if k == 0:
        return None, 0
    bucket = ((k + _BUCKET - 1) // _BUCKET) * _BUCKET
    idx = np.zeros(bucket, dtype=np.int32)
    idx[:k] = indexes
    return jnp.take(arr, jnp.asarray(idx), axis=axis), k


def gather_rows(arr, indexes, axis=0):
    """jnp.take(arr, indexes, axis) for a Python index list, padded to a
    bucket size.  Returns the gathered rows as a numpy (host) array."""
    rows_dev, k = gather_rows_dev(arr, indexes, axis)
    if k == 0:
        shape = list(arr.shape)
        shape[axis] = 0
        return np.empty(tuple(shape), dtype=np.uint32)
    return np.asarray(rows_dev).take(range(k), axis=axis)
