"""Benchmark driver: proof-generation wall time for the Fibonacci program.

Prints one JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference proves the 2^8-op Fibonacci program in 0.19 s on one
i5-7300U core (reference README.md:151; see BASELINE.md).  vs_baseline is
the speedup factor baseline_time / our_time (>1 = faster than the
reference's published number).

The first proof at a given trace geometry triggers XLA compilation; we prove
once to warm the caches and report the steady-state time of the second run.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distaff_tpu_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import distaff_tpu  # noqa: E402
from distaff_tpu import assembly, ProgramInputs, ProofOptions  # noqa: E402

BASELINE_SECONDS = 0.19  # reference fib 2^8, i5-7300U single thread


def fibonacci_program(n):
    return assembly.compile(f"begin repeat.{n - 1} swap dup.2 drop add end end")


def main():
    # ~2^8 user operations -> 2^10-step padded trace
    program = fibonacci_program(64)
    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions()  # default: ext 32, 50 queries, grind 20 (120-bit)

    # warm-up run (compilation)
    t0 = time.time()
    outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
    warm = time.time() - t0

    # timed run
    t0 = time.time()
    outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
    elapsed = time.time() - t0

    # sanity: the proof must verify
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs, proof)

    print(json.dumps({
        "metric": "fibonacci_2^8_proof_gen_wall_time",
        "value": round(elapsed, 3),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 4),
    }))
    print(f"# warm-up (incl. compile): {warm:.1f}s; devices: {jax.devices()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
