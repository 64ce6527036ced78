"""Host polynomial math vs naive evaluation (mirrors reference math test strategy)."""

import random

from distaff_tpu.math import field, polynom, quartic


def test_eval_fft_matches_naive():
    rng = random.Random(0)
    for n in [4, 8, 16, 64]:
        p = [rng.randrange(field.M) for _ in range(n)]
        g = field.get_root_of_unity(n)
        xs = field.get_power_series(g, n)
        expected = [polynom.eval(p, x) for x in xs]
        assert polynom.eval_fft(p) == expected


def test_interpolate_fft_roundtrip():
    rng = random.Random(1)
    p = [rng.randrange(field.M) for _ in range(32)]
    evals = polynom.eval_fft(p)
    assert polynom.interpolate_fft(evals) == p


def test_lagrange_interpolate():
    rng = random.Random(2)
    p = [rng.randrange(field.M) for _ in range(8)]
    xs = [rng.randrange(field.M) for _ in range(8)]
    ys = [polynom.eval(p, x) for x in xs]
    assert polynom.interpolate(xs, ys) == p


def test_syn_div():
    rng = random.Random(3)
    q = [rng.randrange(field.M) for _ in range(15)]
    b = rng.randrange(field.M)
    p = polynom.mul(q, [field.neg(b), 1])  # p = q * (x - b)
    got = polynom.syn_div(p, b)
    assert got[:15] == q and got[15] == 0


def test_syn_div_expanded():
    rng = random.Random(4)
    n, deg = 64, 16
    # q * (x^deg - 1) / (x - e) must divide back out exactly
    e = field.exp(field.get_root_of_unity(deg), 5)
    zpoly = [0] * (deg + 1)
    zpoly[0] = field.M - 1
    zpoly[deg] = 1
    divisor = polynom.div(zpoly, [field.neg(e), 1])
    q = [rng.randrange(field.M) for _ in range(n - deg + 1)]
    p = polynom.mul(q, divisor)
    p += [0] * (n - len(p))
    polynom.syn_div_expanded_in_place(p, deg, [e])
    assert p[: len(q)] == q
    assert all(c == 0 for c in p[len(q) :])


def test_quartic_batch():
    rng = random.Random(5)
    polys = [[rng.randrange(field.M) for _ in range(4)] for _ in range(10)]
    xs = [[rng.randrange(field.M) for _ in range(4)] for _ in range(10)]
    ys = [[polynom.eval(p, x) for x in xsr] for p, xsr in zip(polys, xs)]
    assert quartic.interpolate_batch(xs, ys) == polys
    x = rng.randrange(field.M)
    assert quartic.evaluate_batch(polys, x) == [polynom.eval(p, x) for p in polys]


def test_quartic_transpose():
    v = list(range(16))
    rows = quartic.transpose(v, 1)
    assert rows[0] == [0, 4, 8, 12]
    assert rows[3] == [3, 7, 11, 15]
