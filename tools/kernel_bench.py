"""Microbenchmarks for the device hot kernels on the real chip.

Usage: python tools/kernel_bench.py [log2_n ...]
Times (steady-state, after one warm-up call):
  - fj.ntt            constant-geometry jnp NTT
  - pallas ntt        fused-butterfly Pallas NTT
  - fj.mul            one elementwise field multiply over n
  - power_series_dev  domain power series
  - inv_batch         Fermat batch inverse
  - blake3 leaves     device leaf hashing of n 64-byte rows

Reports ns/butterfly for the NTTs (n/2 * log2 n butterflies).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from distaff_tpu import jax_setup
jax_setup.configure()

import jax
import jax.numpy as jnp
import numpy as np

from distaff_tpu.math import field, field_jax as fj  # noqa: E402
from distaff_tpu.ops import field_pallas as fp  # noqa: E402


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [14, 18, 20]
    print(f"devices: {jax.devices()}")
    for lg in sizes:
        n = 1 << lg
        x = jnp.asarray(np.random.randint(0, 2**32, size=(n, 4), dtype=np.uint64)
                        .astype(np.uint32))
        root = field.get_root_of_unity(n)

        t_ntt = timeit(lambda v: fj.ntt(v, root), x)
        nbf = (n // 2) * lg
        print(f"2^{lg}  fj.ntt          {t_ntt*1e3:9.2f} ms   {t_ntt/nbf*1e9:7.2f} ns/bf")

        try:
            t_pal = timeit(lambda v: fp.ntt_pallas(v, root), x)
            print(f"2^{lg}  pallas ntt      {t_pal*1e3:9.2f} ms   {t_pal/nbf*1e9:7.2f} ns/bf")
        except Exception as e:
            print(f"2^{lg}  pallas ntt      FAILED: {type(e).__name__}: {str(e)[:120]}")

        t_mul = timeit(fj.mul, x, x)
        print(f"2^{lg}  fj.mul          {t_mul*1e3:9.2f} ms   {t_mul/n*1e9:7.2f} ns/elt")

        t_ps = timeit(lambda: fj.power_series_dev(fj.constant(root), n))
        print(f"2^{lg}  power_series    {t_ps*1e3:9.2f} ms")

        t_inv = timeit(fj.inv_batch, x)
        print(f"2^{lg}  inv_batch       {t_inv*1e3:9.2f} ms   {t_inv/n*1e9:7.2f} ns/elt")

        try:
            from distaff_tpu.ops.blake3_jax import hash_rows_u32
            rows = x.reshape(n // 4, 16)
            t_b3 = timeit(lambda r: hash_rows_u32(r, 64), rows)
            print(f"2^{lg}  blake3 {n//4} x64B  {t_b3*1e3:9.2f} ms   "
                  f"{t_b3/(n//4)*1e9:7.2f} ns/leaf")
        except Exception as e:
            print(f"2^{lg}  blake3 leaves   FAILED: {type(e).__name__}: {str(e)[:120]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
