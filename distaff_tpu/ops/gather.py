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


def gather_rows(arr, indexes, axis=0):
    """jnp.take(arr, indexes, axis) for a Python index list, padded to a
    bucket size.  Returns the gathered rows as a numpy (host) array."""
    k = len(indexes)
    if k == 0:
        shape = list(arr.shape)
        shape[axis] = 0
        return np.empty(tuple(shape), dtype=np.uint32)
    bucket = ((k + _BUCKET - 1) // _BUCKET) * _BUCKET
    idx = np.zeros(bucket, dtype=np.int32)
    idx[:k] = indexes
    rows = np.asarray(jnp.take(arr, jnp.asarray(idx), axis=axis))
    return rows.take(range(k), axis=axis)
