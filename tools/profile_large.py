"""Profile a large-trace prove on real hardware with per-step timings.

Usage: python tools/profile_large.py [log2_trace] [grind]
Builds a Fibonacci program sized so the padded execution trace has
2^log2_trace steps, proves it with DEBUG logging (per-pipeline-step
timings from stark.prover), verifies, and prints totals.
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from distaff_tpu import jax_setup
jax_setup.configure()

import jax  # noqa: E402

import distaff_tpu  # noqa: E402
from distaff_tpu import assembly, ProgramInputs, ProofOptions  # noqa: E402
from distaff_tpu.stark import serde  # noqa: E402


def main():
    log2_trace = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    grind = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    logging.basicConfig(level=logging.DEBUG,
                        format="%(relativeCreated)8.0fms %(message)s")
    logging.getLogger("jax").setLevel(logging.WARNING)

    # each unrolled 4-op iteration costs 64/3 trace steps after span padding,
    # so 3N/64 iterations pad to exactly an N-step trace
    n_iter = (1 << log2_trace) * 3 // 64
    t0 = time.time()
    program = assembly.compile(
        f"begin repeat.{n_iter} swap dup.2 drop add end end")
    print(f"assembled + hashed program ({n_iter} iterations) "
          f"in {time.time() - t0:.1f}s", flush=True)

    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions(num_queries=50, grinding_factor=grind)

    for run in ("warm-up", "timed"):
        t0 = time.time()
        outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
        print(f"{run} prove: {time.time() - t0:.2f}s "
              f"(trace 2^{proof.trace_length().bit_length() - 1}, "
              f"security {options.security_level(True)} bits)", flush=True)

    blob = serde.serialize(proof)
    print(f"proof size: {len(blob) / 1024:.0f} KB", flush=True)

    t0 = time.time()
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs, proof)
    print(f"verify: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
