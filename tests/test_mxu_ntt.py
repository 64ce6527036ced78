"""MXU leaf-NTT correctness: the bf16-matmul limb-convolution path must be
bit-identical to the XLA stage-loop leaf (which is itself oracle-tested
against host bigints in test_tiles / test_field_jax)."""

import random

import numpy as np
import pytest

from distaff_tpu.math import field
from distaff_tpu.math import field_jax as fj
from distaff_tpu.ops import tiles
from distaff_tpu.ops import mxu_ntt

pytestmark = pytest.mark.heavy  # compile-heavy on CPU XLA


@pytest.mark.parametrize("b", [2, 5])
def test_mxu_leaf256_matches_xla(b):
    root = field.get_root_of_unity(256)
    rng = random.Random(b)
    x = fj.from_ints(np.array(
        [[rng.randrange(field.M) for _ in range(256)] for _ in range(b)],
        dtype=object))
    tw = tiles.power_series(root, 128)
    got = np.asarray(mxu_ntt.leaf_ntt256(x, root))
    want = np.asarray(tiles._leaf_ntt_tile(x, tw, 256))
    assert (got == want).all()


def test_mxu_reduce_digits_oracle():
    # random ~264-bit values in 31x(<2^24) digit form vs host bigint mod M
    rng = random.Random(7)
    digits = [[rng.randrange(1 << 24) for _ in range(6)]
              for _ in range(mxu_ntt.DIGITS)]
    import jax.numpy as jnp

    d = jnp.asarray(np.array(digits, dtype=np.float32))
    got = fj.to_ints(np.asarray(mxu_ntt._reduce_digits(d)))
    for i in range(6):
        v = sum(digits[dd][i] << (8 * dd) for dd in range(mxu_ntt.DIGITS))
        assert int(got[i]) == v % field.M
