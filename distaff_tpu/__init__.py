"""distaff_tpu: a TPU-native STARK proving framework for the Distaff zkVM.

Top-level API mirrors the reference crate (reference src/lib.rs):

- execute(program, inputs, num_outputs, options) -> (outputs, StarkProof)
- verify(program_hash, public_inputs, outputs, proof) -> True / raises

The VM interpreter and verifier run on the host; trace extension,
constraint evaluation, DEEP composition, and FRI folding run on TPU via
JAX (distaff_tpu.math.field_jax, distaff_tpu.ops).
"""

import logging

from . import jax_setup

jax_setup.configure()

from .config import MAX_OUTPUTS, MIN_TRACE_LENGTH
from .programs import Program, ProgramInputs, assembly
from .stark import ProofOptions, StarkProof, TraceTable
from . import processor, stark

log = logging.getLogger(__name__)


def execute(program, inputs, num_outputs, options):
    """Execute `program` and return (outputs, proof of execution)."""
    assert num_outputs <= MAX_OUTPUTS, (
        f"cannot produce more than {MAX_OUTPUTS} outputs, but requested {num_outputs}"
    )

    from . import native
    if native.available():
        trace_registers, ctx_depth, loop_depth = native.execute_u64(program, inputs)
    else:
        trace_registers, ctx_depth, loop_depth = processor.execute(program, inputs)
    trace = TraceTable(trace_registers, ctx_depth, loop_depth, options.extension_factor())

    last_state = trace.get_last_state()
    outputs = last_state.user_stack[:num_outputs]

    assert last_state.op_counter >= MIN_TRACE_LENGTH, (
        f"a program must consist of at least {MIN_TRACE_LENGTH} operations, "
        f"but only {last_state.op_counter} were executed"
    )

    from .math import field
    program_hash = b"".join(field.to_bytes(v) for v in last_state.program_hash())
    assert program.hash == program_hash, (
        f"expected program hash {program.hash.hex()} does not match trace hash "
        f"{program_hash.hex()}"
    )

    proof = stark.prove(trace, inputs.get_public_inputs(), outputs, options)
    return outputs, proof


def verify(program_hash, public_inputs, outputs, proof):
    """Verify a proof of execution against a 32-byte program hash."""
    return stark.verify(program_hash, public_inputs, outputs, proof)


__all__ = [
    "execute", "verify", "Program", "ProgramInputs", "assembly",
    "ProofOptions", "StarkProof",
]
