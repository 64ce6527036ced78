"""VPU throughput calibration: how many u32 elementwise ops/s does XLA
actually sustain on this chip, and how many effective ops does one field
multiply cost?  Grounds the speed-of-light model in benchmarks.py.

    python tools/vpu_calib.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from distaff_tpu import jax_setup
jax_setup.configure()

import numpy as np
import jax
import jax.numpy as jnp

from distaff_tpu.math import field, field_jax as fj
from distaff_tpu.ops import tiles


def _sync(out):
    np.asarray(out.ravel()[:1])
    return out


def _time(fn, reps=3):
    fn()
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


def main():
    n = 1 << 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, size=(n, 4), dtype=np.uint64)
                    .astype(np.uint32))
    K = 64

    # 1. trivial dependent chain: K multiply-adds -> 2K u32 ops/element
    @jax.jit
    def triv(v):
        y = v
        for _ in range(K):
            y = y * jnp.uint32(2654435761) + jnp.uint32(12345)
        return y

    t = _time(lambda: _sync(triv(x)))
    ops = 2.0 * K * n * 4
    print(f"trivial mul+add chain: {t*1e3:.2f} ms for {K} iters "
          f"-> {ops/t/1e12:.3f} T u32-ops/s")

    # 2. field add chain
    y0 = jnp.asarray(rng.integers(0, 2**32, size=(n, 4), dtype=np.uint64)
                     .astype(np.uint32))
    KA = 32

    @jax.jit
    def addc(a, b):
        y = b
        for _ in range(KA):
            y = fj.add(a, y)
        return y

    t = _time(lambda: _sync(addc(x, y0)))
    print(f"field add chain: {t*1e3:.2f} ms for {KA} iters "
          f"-> {n*KA/t/1e9:.3f} G adds/s "
          f"({3.85e12*t/(n*KA):.0f} effective u32 ops/add at 3.85T)")

    # 3. field mul chain
    KM = 16

    @jax.jit
    def mulc(a, b):
        y = b
        for _ in range(KM):
            y = fj.mul(a, y)
        return y

    t = _time(lambda: _sync(mulc(x, y0)))
    print(f"field mul chain: {t*1e3:.2f} ms for {KM} iters "
          f"-> {n*KM/t/1e9:.3f} G muls/s "
          f"({3.85e12*t/(n*KM):.0f} effective u32 ops/mul at 3.85T)")

    # 4. canonical Pease kernels at the production shape (64, 2^15)
    root_cap = field.get_root_of_unity(tiles.NCAP)
    W = tiles._stage_table(tiles.NCAP, root_cap)
    Wh = tiles._stage_table2(tiles.NCAP, root_cap)
    cb = max(1, tiles.CANON_ELEMS // tiles.NCAP)
    xb = jnp.asarray(rng.integers(0, 2**32, size=(cb, tiles.NCAP, 4),
                                  dtype=np.uint64).astype(np.uint32))
    bf = cb * (tiles.NCAP // 2) * (tiles.NCAP.bit_length() - 1)

    def pease_chain():
        y = xb
        for _ in range(8):
            y = tiles._pease_tile(y, W, tiles.NCAP)
        _sync(y)

    t = _time(pease_chain) / 8
    print(f"_pease_tile ({cb}, {tiles.NCAP}): {t*1e3:.2f} ms "
          f"-> {bf/t/1e9:.3f} G butterflies/s")

    def pease2_chain():
        y = xb
        for _ in range(8):
            y = tiles._pease_tile2(y, W, Wh, tiles.NCAP)
        _sync(y)

    t = _time(pease2_chain) / 8
    print(f"_pease_tile2 ({cb}, {tiles.NCAP}): {t*1e3:.2f} ms "
          f"-> {bf/t/1e9:.3f} G butterflies/s")

    # 5. HBM streaming bound probe: pure copy chain
    @jax.jit
    def copyc(v):
        y = v
        for _ in range(K):
            y = y + jnp.uint32(1)
        return y

    t = _time(lambda: _sync(copyc(x)))
    print(f"add-1 chain: {t*1e3:.2f} ms for {K} iters "
          f"-> {K*n*4/t/1e12:.3f} T u32-ops/s")


if __name__ == "__main__":
    main()
