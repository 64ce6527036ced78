"""Per-stage mesh scaling measurement on the virtual CPU mesh.

Times every mesh-sharded pipeline stage (parallel/mesh_stages.py) at mesh
sizes 1/2/4/8 on the virtual CPU device mesh and prints a JSON table with
each stage's wall time and recorded sharding.  Virtual CPU devices share
the same cores, so these numbers validate that the SPMD partitioning
compiles, executes, and keeps values bit-identical while distributing the
rows - they are NOT a hardware speedup measurement (that needs a real
multi-chip slice; the sharding layout is what transfers).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/mesh_scaling.py [log2_trace]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import numpy as np


def main():
    log2_trace = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import distaff_tpu
    from distaff_tpu import assembly, ProgramInputs, ProofOptions
    from distaff_tpu.parallel import mesh_stages
    from distaff_tpu.stark import serde

    n_iter = (1 << log2_trace) * 3 // 64
    program = assembly.compile(
        f"begin repeat.{n_iter} swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions(extension_factor=16, num_queries=10,
                           grinding_factor=2)

    results = {"log2_trace": log2_trace, "meshes": {}}
    baseline_blob = None
    for n_dev in (1, 2, 4, 8):
        if n_dev == 1:
            os.environ.pop("DISTAFF_MESH_DEVICES", None)
        else:
            os.environ["DISTAFF_MESH_DEVICES"] = str(n_dev)
        mesh_stages.RECORDED_SHARDINGS.clear()
        t0 = time.time()
        outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
        wall = time.time() - t0
        blob = serde.serialize(proof)
        if baseline_blob is None:
            baseline_blob = blob
        assert blob == baseline_blob, f"mesh={n_dev} proof diverged"
        results["meshes"][n_dev] = {
            "prove_wall_s": round(wall, 3),
            "stages_sharded": {
                k: str(v) for k, v in mesh_stages.RECORDED_SHARDINGS.items()
            },
        }
    os.environ.pop("DISTAFF_MESH_DEVICES", None)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
