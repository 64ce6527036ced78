"""Pallas field kernels vs the host oracle (interpret mode on CPU)."""

import pytest
import random

import numpy as np

from distaff_tpu.math import field
from distaff_tpu.math import field_jax as fj
from distaff_tpu.ops import field_pallas as fp

pytestmark = pytest.mark.heavy  # full proofs / mesh / compile-heavy


def test_butterfly_matches_oracle():
    rng = random.Random(0)
    n = 256
    a_int = [rng.randrange(field.M) for _ in range(n)]
    b_int = [rng.randrange(field.M) for _ in range(n)]
    w_int = [rng.randrange(field.M) for _ in range(n)]
    even, odd = fp.butterfly_stage(
        fj.from_ints(a_int), fj.from_ints(b_int), fj.from_ints(w_int))
    assert list(fj.to_ints(np.asarray(even))) == [
        field.add(x, y) for x, y in zip(a_int, b_int)]
    assert list(fj.to_ints(np.asarray(odd))) == [
        field.mul(field.sub(x, y), w) for x, y, w in zip(a_int, b_int, w_int)]


def test_ntt_pallas_matches_jnp():
    rng = random.Random(1)
    x = fj.from_ints([rng.randrange(field.M) for _ in range(256)])
    got = fp.ntt_pallas(x)
    assert (np.asarray(got) == np.asarray(fj.ntt(x))).all()


def test_leaf_ntt_bm_matches_stages():
    # the fused-in-VMEM multi-stage leaf kernel (interpret mode on CPU)
    # must reproduce the XLA Pease stages + bit-reversal exactly
    import random

    import numpy as np

    from distaff_tpu.math import field, field_jax as fj
    from distaff_tpu.ops import field_pallas as fp

    for n, b in [(16, 8), (256, 2), (1024, 1)]:
        rng = random.Random(n + b)
        cols = np.array(
            [[rng.randrange(field.M) for _ in range(n)] for _ in range(b)],
            dtype=object)
        x = fj.from_ints(cols)
        tw = fj.power_series(field.get_root_of_unity(n), n // 2)
        got = fp.leaf_ntt_bm(x, tw, interpret=True)
        want = fj._ntt_stages_bm(x, tw)[:, fj._bitrev_indices(n)]
        assert (np.asarray(got) == np.asarray(want)).all(), (n, b)
