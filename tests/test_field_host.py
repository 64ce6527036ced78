"""Host scalar field vs big-integer oracle (mirrors reference src/math/field.rs:340-448)."""

import random

from distaff_tpu.math import field


def test_add_sub():
    rng = random.Random(1)
    for _ in range(200):
        a, b = rng.randrange(field.M), rng.randrange(field.M)
        assert field.add(a, b) == (a + b) % field.M
        assert field.sub(a, b) == (a - b) % field.M
    assert field.add(field.M - 1, 1) == 0
    assert field.sub(3, 5) == field.M - 2


def test_mul_inv_exp():
    rng = random.Random(2)
    for _ in range(200):
        a, b = rng.randrange(field.M), rng.randrange(field.M)
        assert field.mul(a, b) == (a * b) % field.M
        if a != 0:
            assert field.mul(a, field.inv(a)) == 1
    t = field.M - 1
    assert field.mul(t, t) == 1
    assert field.exp(0, 0) == 0  # reference quirk
    assert field.exp(0, 5) == 0
    assert field.inv(0) == 0


def test_roots_of_unity():
    r40 = field.get_root_of_unity(2**40)
    assert r40 == 23953097886125630542083529559205016746
    assert field.exp(r40, 2**40) == 1
    r16 = field.get_root_of_unity(16)
    assert field.exp(r16, 16) == 1
    assert field.exp(r16, 8) != 1


def test_inv_many():
    rng = random.Random(3)
    values = [rng.randrange(field.M) for _ in range(50)] + [0, 0]
    random.Random(4).shuffle(values)
    invs = field.inv_many(values)
    for v, iv in zip(values, invs):
        assert iv == field.inv(v)
