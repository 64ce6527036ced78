"""Fixed-tile kernels (ops/tiles.py) must be bit-identical to the per-shape
kernels they replace: tiling is pure data movement.

DISTAFF_TILE / DISTAFF_NTT_LEAF / DISTAFF_NTT_BTILE are set small in
conftest.py so tiny inputs exercise multi-tile loops and multi-level NTT
recursion.
"""

import random

import numpy as np
import pytest

from distaff_tpu.math import field
from distaff_tpu.math import field_jax as fj
from distaff_tpu.ops import tiles, fri_jax


def _rand_rows(rng, n):
    return fj.from_ints(np.array(
        [rng.randrange(field.M) for _ in range(n)], dtype=object))


def test_power_series_matches():
    rng = random.Random(1)
    x = rng.randrange(field.M)
    for n in [1, 5, tiles.TILE, 3 * tiles.TILE + 7]:
        got = np.asarray(tiles.power_series(x, n))
        want = np.asarray(fj.power_series(x, n))
        assert (got == want).all(), n


def test_scale_matches():
    rng = random.Random(2)
    v = _rand_rows(rng, 3 * tiles.TILE + 5)
    c = rng.randrange(field.M)
    got = fj.to_ints(np.asarray(tiles.scale(v, c)))
    want = (fj.to_ints(np.asarray(v)) * c) % field.M
    assert (got == want).all()


@pytest.fixture
def _no_compile_cache():
    # the q=200 fold executable deterministically SEGFAULTS the persistent
    # compilation cache's (de)serialization path on CPU (observed on both
    # the read and the write side; every other kernel round-trips fine) -
    # keep this one test's compiles out of the cache.  is_cache_used is
    # memoized process-wide, so the flag flip needs reset_cache() to stick.
    import jax
    from jax._src import compilation_cache as cc

    jax.config.update("jax_enable_compilation_cache", False)
    cc.reset_cache()
    yield
    jax.config.update("jax_enable_compilation_cache", True)
    cc.reset_cache()


@pytest.mark.parametrize("q", [4, 300])  # 300 > TILE exercises the tile loop
def test_fold_rows_matches(q, _no_compile_cache):
    rng = random.Random(q)
    ys = fj.from_ints(np.array(
        [[rng.randrange(field.M) for _ in range(4)] for _ in range(q)],
        dtype=object))
    # both implementations are the same rational function of arbitrary
    # nonzero nodes - no root-of-unity structure needed for the identity
    x0_ints = [rng.randrange(1, field.M) for _ in range(q)]
    x0 = fj.from_ints(np.array(x0_ints, dtype=object))
    ix3 = fj.from_ints(np.array(
        [pow(field.inv(x), 3, field.M) for x in x0_ints], dtype=object))
    sx = fj.constant(rng.randrange(field.M))
    got = np.asarray(tiles.fold_rows(ys, x0, ix3, sx))
    want = np.asarray(fri_jax.fold_rows(ys, x0, ix3, sx))
    assert (got == want).all()


def test_fold_inverse_power_series_identity():
    # fri.reduce supplies the fold's Lagrange denominators as the power
    # series of w^-3 with per-layer [::4] strides; that must equal the
    # elementwise inverse cube of the node series at every layer
    n = 256
    root = field.get_root_of_unity(n)
    x0 = fj.to_ints(np.asarray(tiles.power_series(root, n // 4)))
    ix3 = fj.to_ints(np.asarray(tiles.power_series(
        field.exp(field.inv(root), 3), n // 4)))
    for _ in range(3):
        for a, b in zip(x0, ix3):
            assert (pow(int(a), 3, field.M) * int(b)) % field.M == 1
        x0, ix3 = x0[::4], ix3[::4]


@pytest.mark.parametrize("n,b", [(8, 1), (64, 3), (256, 2), (1024, 1), (4096, 1)])
def test_ntt_batched_matches(n, b):
    # tiles.ntt_batched is batch-MAJOR: (B, n, 4), transform along axis 1
    rng = random.Random(n * 31 + b)
    cols = np.array(
        [[rng.randrange(field.M) for _ in range(n)] for _ in range(b)],
        dtype=object)
    x = fj.from_ints(cols)
    got = fj.to_ints(np.asarray(tiles.ntt_batched(x, field.get_root_of_unity(n))))
    for j in range(b):
        want = fj.to_ints(np.asarray(fj.ntt(fj.from_ints(cols[j]))))
        assert (got[j] == want).all(), (n, b, j)


@pytest.mark.parametrize("n", [16, 512, 2048])
def test_intt_roundtrip(n):
    rng = random.Random(n)
    v = _rand_rows(rng, n)
    back = tiles.intt(tiles.ntt(v))
    assert (np.asarray(back) == np.asarray(v)).all()
    # and against the per-shape inverse
    want = np.asarray(fj.intt(v))
    assert (np.asarray(tiles.intt(v)) == want).all()


def test_hash_rows_matches():
    from distaff_tpu.ops.blake3_jax import hash_rows_u32
    rng = np.random.default_rng(3)
    rows = jnp_rows = rng.integers(0, 2**32, size=(300, 16), dtype=np.uint64).astype(np.uint32)
    import jax.numpy as jnp
    rows = jnp.asarray(rows)
    got = np.asarray(tiles.hash_rows(rows, 64))
    want = np.asarray(hash_rows_u32(rows, 64))
    assert (got == want).all()


def test_weighted_register_sum_matches():
    rng = random.Random(7)
    r, d = 11, 3 * tiles.TILE + 9
    lde = fj.from_ints(np.array(
        [[rng.randrange(field.M) for _ in range(d)] for _ in range(r)],
        dtype=object))
    w = fj.from_ints(np.array(
        [rng.randrange(field.M) for _ in range(r)], dtype=object))
    got = fj.to_ints(np.asarray(tiles.weighted_register_sum(lde, w)))
    lde_i = fj.to_ints(np.asarray(lde))
    w_i = fj.to_ints(np.asarray(w))
    want = np.zeros(d, dtype=object)
    for i in range(r):
        want = (want + lde_i[i] * w_i[i]) % field.M
    assert (got == want).all()
