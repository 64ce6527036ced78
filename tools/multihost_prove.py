"""Multi-host SPMD proving entry point.

Run the SAME command on every host of a 2+ host TPU job (reference has no
multi-host analogue; this is the BASELINE north-star scale-out path):

    DISTAFF_COORDINATOR=host0:9321 DISTAFF_NUM_PROCESSES=2 \
    DISTAFF_PROCESS_ID=<k> python tools/multihost_prove.py [log2_trace]

or, on a TPU pod slice with auto-detected topology:

    DISTAFF_DISTRIBUTED=1 python tools/multihost_prove.py [log2_trace]

Every process joins the jax.distributed job (distaff_tpu.jax_setup), a mesh
spans ALL hosts' devices, and the prover's sharded stages (trace LDE,
intra-NTT four-step with all-to-all, AIR sweep, composition, FRI folds)
split across it - collectives ride ICI within a slice, DCN across hosts.
Proof bytes are identical to single-device proving; process 0 prints them.

Single-process smoke test (exercises the full entry path end-to-end):

    DISTAFF_COORDINATOR=localhost:9321 DISTAFF_NUM_PROCESSES=1 \
    DISTAFF_PROCESS_ID=0 JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/multihost_prove.py 6
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distaff_tpu import jax_setup  # noqa: E402

WAS_DISTRIBUTED = jax_setup.initialize_distributed()

import jax  # noqa: E402

import distaff_tpu  # noqa: E402
from distaff_tpu import assembly, ProgramInputs, ProofOptions  # noqa: E402
from distaff_tpu.stark import serde  # noqa: E402


def main():
    log2_trace = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    n_devices = len(jax.devices())
    pid = jax.process_index() if WAS_DISTRIBUTED else 0
    print(f"# process {pid}: {jax.process_count() if WAS_DISTRIBUTED else 1} "
          f"process(es), {n_devices} global device(s)", flush=True)

    # mesh over every device of every host; power-of-two for the NTT splits
    mesh_n = 1 << (n_devices.bit_length() - 1)
    os.environ["DISTAFF_MESH_DEVICES"] = str(mesh_n)

    n_iter = max(1, (1 << log2_trace) * 3 // 64)
    program = assembly.compile(
        f"begin repeat.{n_iter} swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions(extension_factor=16, num_queries=10,
                           grinding_factor=2)

    t0 = time.time()
    outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
    elapsed = time.time() - t0
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs, proof)

    blob = serde.serialize(proof)
    if pid == 0:
        print(f"# proved + verified 2^{proof.trace_length().bit_length() - 1}"
              f"-step trace on {mesh_n} device(s) in {elapsed:.1f}s")
        print(f"proof_sha256={hashlib.sha256(blob).hexdigest()}", flush=True)


if __name__ == "__main__":
    main()
