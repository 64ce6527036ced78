"""Measure the HBM cost of array layouts at program boundaries.

Hypothesis: (n, 4)-minor uint32 arrays are stored T(8,128)-padded (minor
dim 4 -> 128 lanes = 32x bytes), so every eager elementwise op pays 32x
HBM.  Compares identical element counts in three shapes and reads XLA's
own memory analysis for the argument sizes.

    python tools/layout_probe.py
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


def _sync(out):
    np.asarray(out.ravel()[:1])
    return out


def _time(fn, reps=5):
    fn()
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


K = 8


def chain(v):
    y = v
    for _ in range(K):
        y = y * jnp.uint32(2654435761) + jnp.uint32(12345)
    return y


def main():
    n = 1 << 24  # total u32 elements = 64 MB logical
    rng = np.random.default_rng(0)
    base = rng.integers(0, 2**32, size=(n,), dtype=np.uint64).astype(np.uint32)

    for label, shape in [("flat   (2^24,)", (n,)),
                         ("minor4 (2^22, 4)", (n // 4, 4)),
                         ("soa    (4, 2^22)", (4, n // 4)),
                         ("wide   (2^9, 2^15)", (1 << 9, 1 << 15))]:
        x = jnp.asarray(base.reshape(shape))
        f = jax.jit(chain)
        t = _time(lambda: _sync(f(x)))
        c = f.lower(x).compile()
        ma = c.memory_analysis()
        arg = getattr(ma, "argument_size_in_bytes", -1)
        out = getattr(ma, "output_size_in_bytes", -1)
        print(f"{label}: {t*1e3:7.2f} ms/chain  arg={arg/2**20:8.1f} MiB "
              f"out={out/2**20:8.1f} MiB  (logical {n*4/2**20:.0f} MiB)",
              flush=True)

    # boundary crossing: two separate jits (no fusion across), minor-4 vs
    # dense, to measure the per-crossing cost directly
    for label, shape in [("minor4 2-program", (n // 4, 4)),
                         ("flat   2-program", (n,))]:
        x = jnp.asarray(base.reshape(shape))
        f1 = jax.jit(lambda v: v + jnp.uint32(1))
        f2 = jax.jit(lambda v: v * jnp.uint32(3))
        t = _time(lambda: _sync(f2(f1(x))))
        print(f"{label}: {t*1e3:7.2f} ms for 2 dispatches", flush=True)

    # reshape cost: (n/4, 4) <-> (4, n/4) <-> flat
    x4 = jnp.asarray(base.reshape(n // 4, 4))
    t = _time(lambda: _sync(jax.jit(lambda v: v.reshape(-1))(x4)))
    print(f"reshape (2^22,4)->flat: {t*1e3:7.2f} ms", flush=True)
    xf = jnp.asarray(base)
    t = _time(lambda: _sync(jax.jit(lambda v: v.reshape(-1, 4))(xf)))
    print(f"reshape flat->(2^22,4): {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
