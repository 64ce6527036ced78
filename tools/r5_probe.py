"""Round-5 ground-truth probe: ladder 2^16 -> 2^18 -> 2^20 with per-phase
debug timers, warm + steady per rung.  Run on the real TPU:

    python tools/r5_probe.py [sizes...]
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.DEBUG,
                    format="%(asctime)s %(name)s %(message)s")
for noisy in ("jax", "jax._src"):
    logging.getLogger(noisy).setLevel(logging.WARNING)

from distaff_tpu import jax_setup
jax_setup.configure()
import jax

print(f"# devices: {jax.devices()}", flush=True)

import distaff_tpu
from distaff_tpu import assembly, ProgramInputs, ProofOptions

if jax.devices()[0].platform != "cpu":
    from distaff_tpu.ops import tiles
    t0 = time.time()
    tiles.warm_kernels()
    print(f"# warm_kernels enqueued in {time.time()-t0:.1f}s", flush=True)


def fib_program(log2_trace):
    n_iter = (1 << log2_trace) * 3 // 64
    return assembly.compile(f"begin repeat.{n_iter} swap dup.2 drop add end end")


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16, 18, 20]
    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions()
    for log2 in sizes:
        program = fib_program(log2)
        t0 = time.time()
        outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
        warm = time.time() - t0
        assert proof.trace_length() == 1 << log2
        print(f"## 2^{log2} warm: {warm:.2f}s", flush=True)
        t0 = time.time()
        outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
        steady = time.time() - t0
        print(f"## 2^{log2} steady: {steady:.2f}s", flush=True)
        assert distaff_tpu.verify(
            program.hash, inputs.get_public_inputs(), outputs, proof)


if __name__ == "__main__":
    main()
