"""Compile-and-run check of the fused transition-AIR kernel with SHARDED
operands on real hardware.

The virtual CPU mesh tests execute the sharded AIR op-by-op (CPU XLA's
compile of the fused kernel is pathological), so the exact artifact a real
pod would run - the jit-compiled `_transition_kernel` with mesh-sharded
(R, n_ev, 4) operands - needs a hardware pass.  This tool builds a 1+-device
mesh over the available accelerator(s), runs `mesh_stages.transition_sharded`
with jit ENABLED, and asserts the combined column matches the native host
sweep bit-for-bit.

    python tools/mesh_air_check.py [log2_trace]     # default 10

Exit 0 + "MESH AIR OK" = the pod-path kernel compiles, executes sharded, and
agrees with the independent native evaluator.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distaff_tpu import jax_setup

jax_setup.configure()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    log2_trace = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import distaff_tpu  # noqa: F401
    from distaff_tpu import assembly, ProgramInputs
    from distaff_tpu import native
    from distaff_tpu.processor import execute as vm_execute
    from distaff_tpu.stark.trace_table import TraceTable
    from distaff_tpu.stark.constraints.evaluator import Evaluator
    from distaff_tpu.stark import prover as prover_mod
    from distaff_tpu.parallel import mesh as pmesh, mesh_stages
    from distaff_tpu.config import MAX_CONSTRAINT_DEGREE

    devices = jax.devices()
    n_dev = 1 << (len(devices).bit_length() - 1)
    mesh = pmesh.make_mesh(n_dev, devices=np.array(devices[:n_dev]))
    print(f"# mesh over {n_dev} {devices[0].platform} device(s)")

    n_iter = max(1, (1 << log2_trace) * 3 // 64)
    program = assembly.compile(
        f"begin repeat.{n_iter} swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    regs, ctx_depth, loop_depth = vm_execute(program, inputs)

    trace = TraceTable(regs, ctx_depth, loop_depth, MAX_CONSTRAINT_DEGREE * 4)
    trace.extend()
    evaluator = Evaluator.from_trace(trace, b"\x42" * 32, [1, 0], [0])
    stride = trace.extension_factor // MAX_CONSTRAINT_DEGREE

    assert not jax.config.jax_disable_jit, "jit must be enabled for this check"
    t0 = time.time()
    combined = mesh_stages.transition_sharded(evaluator, trace, mesh)
    combined_host = np.asarray(combined)
    t_mesh = time.time() - t0
    print(f"# sharded fused AIR kernel (jit on): {t_mesh:.1f}s "
          f"(sharding: {mesh_stages.RECORDED_SHARDINGS['transition']})")

    assert native.available(), "native evaluator needed as the oracle"
    want = prover_mod._native_transition_column(
        evaluator, trace, stride, debug_check=True)
    assert (combined_host == np.asarray(want)).all(), (
        "sharded fused AIR kernel disagrees with the native sweep")
    print("MESH AIR OK: compiled+sharded transition kernel matches the "
          "native oracle bit-for-bit")


if __name__ == "__main__":
    main()
