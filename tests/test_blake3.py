"""BLAKE3 against official spec vectors and scalar-vs-batch consistency."""

import numpy as np

from distaff_tpu.crypto.blake3 import blake3, blake3_batch


def _pattern(n):
    return bytes(i % 251 for i in range(n))


def test_official_vectors():
    # from the BLAKE3 spec test-vector file (inputs are the repeating 0..250 pattern)
    assert blake3(_pattern(1)).hex() == (
        "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213"
    )


def test_batch_matches_scalar():
    rng = np.random.default_rng(0)
    for length in [1, 32, 63, 64, 65, 128, 272, 800, 1024, 1025, 2048, 3000]:
        data = rng.integers(0, 256, size=(5, length), dtype=np.uint8)
        got = blake3_batch(data)
        for i in range(5):
            expected = np.frombuffer(blake3(data[i].tobytes()), dtype=np.uint8)
            assert np.array_equal(got[i], expected), length
