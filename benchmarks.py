"""Microbenchmarks mirroring the reference's criterion suite (reference
benches/: field add/mul/exp/inv, hashes on 64 B, FFT, quartic batch ops)
plus the TPU-native kernel rates (NTT butterflies/s, Rescue rounds/s,
batch-hash throughput).

Usage: python benchmarks.py [--json]
"""

import argparse
import json
import os
import random
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from distaff_tpu.math import field, field_jax as fj
from distaff_tpu.crypto import hashes
from distaff_tpu.crypto.blake3 import blake3_batch
from distaff_tpu.utils import hasher


def _time(fn, reps=5, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args()

    rng = random.Random(0)
    results = {}

    # scalar host field ops (the reference benches these on 1 core)
    a, b = rng.randrange(field.M), rng.randrange(field.M)
    n_ops = 100_000
    t = _time(lambda: [field.mul(a, b) for _ in range(n_ops)], reps=3)
    results["host_field_mul_ns"] = t / n_ops * 1e9
    t = _time(lambda: [field.add(a, b) for _ in range(n_ops)], reps=3)
    results["host_field_add_ns"] = t / n_ops * 1e9
    t = _time(lambda: [field.inv(a) for _ in range(1000)], reps=3)
    results["host_field_inv_us"] = t / 1000 * 1e6

    # hashes on 64-byte inputs
    data = bytes(range(64))
    for name in ["blake3", "sha3", "poseidon", "rescue", "gmimc"]:
        fn = hashes.HASH_FUNCTIONS[name]
        reps = 2000 if name in ("blake3", "sha3") else 50
        t = _time(lambda: [fn(data) for _ in range(reps)], reps=2)
        results[f"hash_{name}_us"] = t / reps * 1e6

    # batch blake3 (native when built)
    batch = np.random.default_rng(0).integers(0, 256, size=(1 << 16, 64), dtype=np.uint8)
    t = _time(lambda: blake3_batch(batch), reps=3)
    results["blake3_batch_Mhashes_per_s"] = (1 << 16) / t / 1e6

    # in-VM Rescue round (host scalar)
    state = [rng.randrange(field.M) for _ in range(6)]
    t = _time(lambda: [hasher.apply_round(list(state), i) for i in range(100)], reps=2)
    results["rescue_round_us"] = t / 100 * 1e6

    # device NTT (butterflies/s): n/2 * log2(n) butterflies per transform
    n = 1 << 18
    x = jax.numpy.tile(fj.from_ints([rng.randrange(field.M) for _ in range(4096)]),
                       (n // 4096, 1))
    fj.ntt(x).block_until_ready()
    t = _time(lambda: fj.ntt(x).block_until_ready(), reps=5)
    butterflies = (n // 2) * (n.bit_length() - 1)
    results["device_ntt_2e18_ms"] = t * 1e3
    results["device_ntt_Gbutterflies_per_s"] = butterflies / t / 1e9

    # device field multiply throughput
    y = jax.numpy.roll(x, 1, axis=0)
    fj.mul(x, y).block_until_ready()
    t = _time(lambda: fj.mul(x, y).block_until_ready(), reps=5)
    results["device_mul_Gops_per_s"] = n / t / 1e9

    results["device"] = str(jax.devices()[0])
    if args.json:
        print(json.dumps(results))
    else:
        for k, v in results.items():
            print(f"{k:40s} {v if isinstance(v, str) else round(v, 3)}")


if __name__ == "__main__":
    main()
