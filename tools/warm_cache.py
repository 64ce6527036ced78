"""Pre-populate the persistent XLA compile cache for the bench geometries.

In this deployment XLA compiles run on the far side of the TPU tunnel and can
take minutes per kernel under load; the persistent cache
(distaff_tpu.jax_setup) makes every later process load executables in seconds
instead.  Run this once after changing any device-path code:

    python tools/warm_cache.py [log2_sizes ...]      # default: 16 18 20 12 10
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import distaff_tpu
from distaff_tpu import assembly, ProgramInputs, ProofOptions


def warm(log2_trace):
    n_iter = (1 << log2_trace) * 3 // 64
    program = assembly.compile(
        f"begin repeat.{n_iter} swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    t0 = time.time()
    outputs, proof = distaff_tpu.execute(program, inputs, 1, ProofOptions())
    cold = time.time() - t0
    t0 = time.time()
    distaff_tpu.execute(program, inputs, 1, ProofOptions())
    warm_t = time.time() - t0
    print(f"2^{log2_trace}: cold {cold:.1f}s warm {warm_t:.1f}s", flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [16, 18, 20, 12, 10]
    for s in sizes:
        warm(s)
