"""Multi-host SPMD proving entry point and scaling-efficiency instrument.

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

Measurement mode (--bench): proves twice (warm + steady), captures the
prover's per-stage wall times, and writes one JSON line (plus a file via
--out).  Scaling efficiency against a 1-host run of the same size:

    python tools/multihost_prove.py 12 --bench --out host1.json   # 1 host
    ... N-host job: python tools/multihost_prove.py 12 --bench \
            --baseline host1.json
    -> {"scaling_efficiency": t1 / (N * tN), ...}   (target >= 0.70)

Single-process smoke test (exercises the full entry path end-to-end):

    DISTAFF_COORDINATOR=localhost:9321 DISTAFF_NUM_PROCESSES=1 \
    DISTAFF_PROCESS_ID=0 JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/multihost_prove.py 6 --bench

Validated state of the >= 2-process path (2026-08-22, two local CPU
processes): jax_setup.initialize_distributed rendezvouses both processes
and - with the gloo CPU-collectives backend it now enables - they form ONE
global client (process_count()==2, global mesh over both processes'
devices) and the sharded compute stages launch.  The remaining gap to a
full cross-process proof is HOST-side: the prover's transcript fetches
(tree roots, openings, query rows) call np.asarray on globally-sharded
arrays, which multi-process JAX rejects for non-addressable shards - each
such fetch needs jax.experimental.multihost_utils.process_allgather (or a
replicate-before-fetch reshard).  Single-controller meshes (the virtual
8-device CPU mesh and real multi-chip slices under one host) are
unaffected - all devices are addressable there, and
tests/test_sharded.py's byte-identity proofs cover them.
"""

import argparse
import hashlib
import json
import logging
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distaff_tpu import jax_setup  # noqa: E402

WAS_DISTRIBUTED = jax_setup.initialize_distributed()

import jax  # noqa: E402

import distaff_tpu  # noqa: E402
from distaff_tpu import assembly, ProgramInputs, ProofOptions  # noqa: E402
from distaff_tpu.stark import serde  # noqa: E402

# prover log line -> stage key (the debug timers in stark/prover.py)
_STAGE_PATTERNS = [
    ("trace_lde", r"Extended execution trace .* in (\d+) ms"),
    ("trace_commit", r"Built trace Merkle tree in (\d+) ms"),
    ("constraint_eval", r"Evaluated \d+ constraints .* in (\d+) ms"),
    ("constraint_poly", r"Combined constraint evaluations .* in (\d+) ms"),
    ("constraint_commit", r"Evaluated constraint polynomial .* in (\d+) ms"),
    ("composition", r"Built composition evaluations .* in (\d+) ms"),
    ("fri", r"Computed \d+ FRI layers in (\d+) ms"),
    ("queries", r"Determined \d+ query positions in (\d+) ms"),
    ("proof_object", r"Built proof object in (\d+) ms"),
]


class _StageTimes(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.stages = {}

    def emit(self, record):
        msg = record.getMessage()
        for key, pat in _STAGE_PATTERNS:
            m = re.search(pat, msg)
            if m:
                self.stages[key] = int(m.group(1)) / 1000.0
                return


def _prove_once(program, inputs, options):
    t0 = time.time()
    outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
    elapsed = time.time() - t0
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs, proof)
    return elapsed, proof


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("log2_trace", nargs="?", type=int, default=10)
    parser.add_argument("--bench", action="store_true",
                        help="warm + steady runs, per-stage times, JSON out")
    parser.add_argument("--out", help="write the bench JSON to this path")
    parser.add_argument("--baseline",
                        help="a 1-host bench JSON to compute scaling "
                             "efficiency against")
    args = parser.parse_args()

    n_devices = len(jax.devices())
    n_proc = jax.process_count() if WAS_DISTRIBUTED else 1
    pid = jax.process_index() if WAS_DISTRIBUTED else 0
    print(f"# process {pid}: {n_proc} process(es), {n_devices} global "
          f"device(s)", flush=True)

    # mesh over every device of every host; power-of-two for the NTT splits
    mesh_n = 1 << (n_devices.bit_length() - 1)
    os.environ["DISTAFF_MESH_DEVICES"] = str(mesh_n)

    n_iter = max(1, (1 << args.log2_trace) * 3 // 64)
    program = assembly.compile(
        f"begin repeat.{n_iter} swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions(extension_factor=16, num_queries=10,
                           grinding_factor=2)

    capture = None
    if args.bench:
        capture = _StageTimes()
        plog = logging.getLogger("distaff_tpu.stark.prover")
        plog.setLevel(logging.DEBUG)
        plog.addHandler(capture)

    warm, proof = _prove_once(program, inputs, options)
    steady = warm
    if args.bench:
        capture.stages.clear()           # keep only the steady run's stages
        steady, proof = _prove_once(program, inputs, options)

    blob = serde.serialize(proof)
    if pid == 0:
        print(f"# proved + verified 2^{proof.trace_length().bit_length() - 1}"
              f"-step trace on {mesh_n} device(s) in {steady:.1f}s "
              f"(warm {warm:.1f}s)")
        print(f"proof_sha256={hashlib.sha256(blob).hexdigest()}", flush=True)

    if args.bench and pid == 0:
        result = {
            "log2_trace": args.log2_trace,
            "processes": n_proc,
            "mesh_devices": mesh_n,
            "platform": jax.devices()[0].platform,
            "warm_s": round(warm, 3),
            "steady_s": round(steady, 3),
            "stages_s": {k: round(v, 3) for k, v in capture.stages.items()},
            "proof_sha256": hashlib.sha256(blob).hexdigest(),
        }
        if args.baseline:
            with open(args.baseline) as fh:
                base = json.load(fh)
            assert base["log2_trace"] == args.log2_trace, (
                "baseline is for a different trace size")
            speedup = base["steady_s"] / steady
            scale = n_proc / max(base["processes"], 1)
            result["speedup_vs_baseline"] = round(speedup, 4)
            result["scaling_efficiency"] = round(speedup / scale, 4)
            result["proof_matches_baseline"] = (
                base["proof_sha256"] == result["proof_sha256"])
        line = json.dumps(result)
        print(line, flush=True)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(line + "\n")


if __name__ == "__main__":
    main()
