"""Device limb field (uint32x4) vs host scalar oracle."""

import random
import itertools

import pytest

from distaff_tpu.math import field, polynom
from distaff_tpu.math import field_jax as fj

# core tier: the device field arithmetic is the math foundation of every
# kernel; the whole module runs in ~15 s on CPU


@pytest.fixture(scope="module")
def vectors():
    rng = random.Random(0)
    vals = [0, 1, 2, field.M - 1, field.M - 2, (field.M + 1) // 2, 45 * 2**40 - 1, 2**127]
    vals += [rng.randrange(field.M) for _ in range(120)]
    return vals, list(reversed(vals))


def test_add_sub_mul(vectors):
    a_int, b_int = vectors
    a, b = fj.from_ints(a_int), fj.from_ints(b_int)
    assert list(fj.to_ints(fj.add(a, b))) == [field.add(x, y) for x, y in zip(a_int, b_int)]
    assert list(fj.to_ints(fj.sub(a, b))) == [field.sub(x, y) for x, y in zip(a_int, b_int)]
    assert list(fj.to_ints(fj.mul(a, b))) == [field.mul(x, y) for x, y in zip(a_int, b_int)]
    assert list(fj.to_ints(fj.neg(a))) == [field.neg(x) for x in a_int]


def test_exp_inv(vectors):
    a_int, _ = vectors
    a = fj.from_ints(a_int)
    assert list(fj.to_ints(fj.cube(a))) == [pow(x, 3, field.M) for x in a_int]
    assert list(fj.to_ints(fj.exp_const(a, 12345))) == [pow(x, 12345, field.M) for x in a_int]
    assert list(fj.to_ints(fj.inv_batch(a))) == [field.inv(x) for x in a_int]


def test_power_series_dot_cumsum(vectors):
    a_int, b_int = vectors
    a, b = fj.from_ints(a_int), fj.from_ints(b_int)
    assert list(fj.to_ints(fj.power_series(7, 33))) == field.get_power_series(7, 33)
    assert list(fj.to_ints(fj.power_series_dev(fj.constant(7), 33))) == field.get_power_series(7, 33)
    d = fj.dot(a, b)
    assert int(fj.to_ints(d[None])[0]) == sum(x * y for x, y in zip(a_int, b_int)) % field.M
    cs = list(fj.to_ints(fj.cumsum(a)))
    assert cs == list(itertools.accumulate(a_int, lambda x, y: (x + y) % field.M))


@pytest.mark.parametrize("n", [4, 64, 256])
def test_ntt_roundtrip(n):
    rng = random.Random(n)
    p = [rng.randrange(field.M) for _ in range(n)]
    dev = list(fj.to_ints(fj.ntt(fj.from_ints(p))))
    assert dev == polynom.eval_fft(p)
    back = list(fj.to_ints(fj.intt(fj.from_ints(dev))))
    assert back == p


@pytest.mark.parametrize("n,max_rows", [(256, None), (1024, 4), (4096, 8)])
def test_ntt_four_step_matches_pease(n, max_rows):
    rng = random.Random(n)
    p = [rng.randrange(field.M) for _ in range(n)]
    x = fj.from_ints(p)
    want = list(fj.to_ints(fj.ntt(x)))
    got = list(fj.to_ints(fj.ntt_four_step(x, max_rows=max_rows)))
    assert got == want
