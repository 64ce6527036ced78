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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from distaff_tpu.jax_setup import machine_cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", machine_cache_dir())

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


def _sync(out):
    """Force completion of device work: on the tunneled TPU,
    block_until_ready returns immediately (the runtime is fully async up to
    the first device->host fetch), so fetch one tiny row instead."""
    np.asarray(out[:1])
    return out


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

    # ---- device kernel rates vs speed-of-light --------------------------------------------------
    #
    # Roofline model (documented so the ratios are checkable):
    # - TPU v5e (1 TensorCore/chip): VPU is (8, 128) lanes x 4 ALUs at
    #   ~0.94 GHz ~= 3.85e12 u32 ops/s; HBM ~819 GB/s.
    # - one 128-bit field mul in 16-bit halfwords: 64 partial products
    #   (1 mul-lo + 1 mul-hi emulated via 2x u32 mul + masks ~ 4 ops each),
    #   carry normalization + two modulus foldings ~= 450 u32 vector ops
    #   (counted from field_jax._mul_halfwords/_carry_normalize lowering).
    # - one NTT butterfly = 1 add + 1 sub + 1 mul ~= 520 u32 ops, and moves
    #   32 B in + 32 B out of HBM when unfused.
    VPU_OPS = 3.85e12
    HBM_BPS = 819e9
    OPS_PER_MUL = 450.0
    OPS_PER_BUTTERFLY = 520.0

    from distaff_tpu.ops import tiles
    from distaff_tpu.ops.blake3_jax import hash_rows_u32

    # the device->host sync through the tunnel costs ~25 ms of RTT, so each
    # measurement chains CHAIN dependent iterations and syncs once
    CHAIN = 16

    # production NTT path (tiles, batch-major) at a bench-relevant size
    n = 1 << 20
    x = jax.numpy.tile(
        fj.from_ints([rng.randrange(field.M) for _ in range(4096)]),
        (n // 4096, 1))
    root = field.get_root_of_unity(n)

    def ntt_chain():
        y = x
        for _ in range(CHAIN):
            y = tiles.ntt(y, root)
        _sync(y)

    ntt_chain()
    t = _time(ntt_chain, reps=3) / CHAIN
    butterflies = (n // 2) * (n.bit_length() - 1)
    results["device_ntt_2e20_ms"] = t * 1e3
    rate_b = butterflies / t
    results["device_ntt_Gbutterflies_per_s"] = rate_b / 1e9
    results["device_ntt_vs_compute_sol"] = rate_b / (VPU_OPS / OPS_PER_BUTTERFLY)
    results["device_ntt_vs_hbm_sol"] = rate_b / (HBM_BPS / 64.0)

    # raw device field multiply throughput
    y0 = jax.numpy.roll(x, 1, axis=0)

    def mul_chain():
        y = y0
        for _ in range(CHAIN):
            y = fj.mul(x, y)
        _sync(y)

    mul_chain()
    t = _time(mul_chain, reps=3) / CHAIN
    rate_m = n / t
    results["device_mul_Gops_per_s"] = rate_m / 1e9
    results["device_mul_vs_compute_sol"] = rate_m / (VPU_OPS / OPS_PER_MUL)
    # unfused elementwise mul moves 96 B/element (2 in + 1 out)
    results["device_mul_vs_hbm_sol"] = rate_m / (HBM_BPS / 96.0)

    # device BLAKE3 row hashing (Merkle leaves): rows/s on 384-byte rows
    # (24-register trace); BLAKE3 is ~7 rounds x 8 G x ~14 ops per 64-byte
    # block ~= 800 u32 ops/block, 6 blocks/row
    rows = jax.numpy.asarray(
        np.random.default_rng(1).integers(0, 2**32, size=(1 << 18, 96),
                                          dtype=np.uint64).astype(np.uint32))

    def hash_chain():
        h = rows
        for _ in range(CHAIN):
            h = jax.numpy.concatenate(
                [hash_rows_u32(h, 384), h[:, 8:]], axis=1)
        _sync(h)

    hash_chain()
    t = _time(hash_chain, reps=3) / CHAIN
    rate_h = (1 << 18) / t
    results["device_blake3_384B_Mrows_per_s"] = rate_h / 1e6
    results["device_blake3_vs_compute_sol"] = rate_h / (VPU_OPS / (800.0 * 6))

    # fused (single-dispatch) variants: the eager rates above include the
    # tunneled per-dispatch overhead (~3 ms each); these jit K iterations
    # into ONE program, so they measure what the silicon actually sustains
    K = 16

    @jax.jit
    def _mul_k(a, b):
        y = b
        for _ in range(K):
            y = fj.mul(a, y)
        return y

    _sync(_mul_k(x, y0))
    t = _time(lambda: _sync(_mul_k(x, y0)), reps=3) / K
    rate_mf = n / t
    results["device_mul_fused_Gops_per_s"] = rate_mf / 1e9
    results["device_mul_fused_vs_compute_sol"] = rate_mf / (VPU_OPS / OPS_PER_MUL)

    ntt_fused = jax.jit(lambda v: tiles.ntt(tiles.ntt(v, root), root))
    _sync(ntt_fused(x))
    t = _time(lambda: _sync(ntt_fused(x)), reps=3) / 2
    rate_bf = butterflies / t
    results["device_ntt_fused_2e20_ms"] = t * 1e3
    results["device_ntt_fused_Gbutterflies_per_s"] = rate_bf / 1e9
    results["device_ntt_fused_vs_compute_sol"] = (
        rate_bf / (VPU_OPS / OPS_PER_BUTTERFLY))
    results["device_ntt_fused_vs_hbm_sol"] = rate_bf / (HBM_BPS / 64.0)

    # canonical per-size Pease kernel at the production shape
    # (CANON_ELEMS/NCAP, NCAP) - the executable every ladder rung's
    # transforms actually dispatch (ops/tiles._pease_tile2, the 2-level
    # fused stage kernel)
    root_cap = field.get_root_of_unity(tiles.NCAP)
    W = tiles._stage_table(tiles.NCAP, root_cap)
    Wh = tiles._stage_table2(tiles.NCAP, root_cap)
    cbp = max(1, tiles.CANON_ELEMS // tiles.NCAP)
    xp = jax.numpy.asarray(
        np.random.default_rng(2).integers(
            0, 2**32, size=(cbp, tiles.NCAP, 4), dtype=np.uint64)
        .astype(np.uint32))

    def pease_chain():
        y = xp
        for _ in range(8):
            y = tiles._pease_tile2(y, W, Wh, tiles.NCAP)
        _sync(y)

    pease_chain()
    t = _time(pease_chain, reps=3) / 8
    bf_p = cbp * (tiles.NCAP // 2) * (tiles.NCAP.bit_length() - 1)
    rate_p = bf_p / t
    results["device_pease_canonical_Gbutterflies_per_s"] = rate_p / 1e9
    results["device_pease_canonical_vs_compute_sol"] = (
        rate_p / (VPU_OPS / OPS_PER_BUTTERFLY))
    results["device_pease_canonical_vs_hbm_sol"] = rate_p / (HBM_BPS / 64.0)

    # experimental MXU leaf (ops/mxu_ntt.py): 256-point DFT stages as bf16
    # limb-convolution matmuls on the systolic array, twiddles absorbed
    try:
        from distaff_tpu.ops import mxu_ntt

        root256 = field.get_root_of_unity(256)
        xb = x[: 4096 * 256].reshape(4096, 256, 4)
        _sync(mxu_ntt.leaf_ntt256(xb, root256))
        t = _time(lambda: _sync(mxu_ntt.leaf_ntt256(xb, root256)), reps=3)
        bf256 = 4096 * 128 * 8
        results["device_mxu_leaf256_Gbutterflies_per_s"] = bf256 / t / 1e9
    except Exception as exc:  # pragma: no cover
        results["device_mxu_leaf256_error"] = f"{type(exc).__name__}"

    results["device"] = str(jax.devices()[0])
    if args.json:
        print(json.dumps(results))
    else:
        for k, v in results.items():
            print(f"{k:40s} {v if isinstance(v, str) else round(v, 3)}")


if __name__ == "__main__":
    main()
