"""AIR constraint tests: valid traces satisfy the transition constraints
(the analogue of the reference's per-family constraint tests plus its
debug-build zero-check harness, reference constraints/evaluator.rs:152-158).
"""

import numpy as np
import pytest

from distaff_tpu import processor
from distaff_tpu.programs import assembly, ProgramInputs
from distaff_tpu.stark.trace_table import TraceTable
from distaff_tpu.stark.constraints.evaluator import Evaluator
from distaff_tpu.stark import prover


PROGRAMS = [
    # exercises add/mul/push + block nesting
    ("begin add block push.5 mul push.7 end end", ProgramInputs.from_public([1, 2])),
    # exercises switch + eq/choose ops
    ("begin read if.true add push.3 else push.7 add push.8 end mul end",
     ProgramInputs([5, 3], [0], [])),
    # exercises loop wrap/break
    ("begin mul read while.true dup mul read end end", ProgramInputs([5, 3], [1, 1, 0], [])),
    # exercises cmp chains
    ("begin push.5 push.3 gt.8 end", ProgramInputs.none()),
    # exercises rescr rounds
    ("begin push.3 push.5 hash.2 end", ProgramInputs.none()),
    # exercises binacc
    ("begin read rc.16 end", ProgramInputs([], [42], [])),
]


@pytest.mark.parametrize("src,inputs", PROGRAMS)
def test_transition_constraints_vanish_on_trace(src, inputs):
    program = assembly.compile(src)
    regs, ctx_depth, loop_depth = processor.execute(program, inputs)
    trace = TraceTable(regs, ctx_depth, loop_depth, 16)
    trace.extend()

    outputs = trace.get_last_state().user_stack[:1]
    evaluator = Evaluator.from_trace(
        trace, b"\x11" * 32, inputs.get_public_inputs(), outputs)

    # the columnar evaluator asserts that the combined transition constraint
    # column is zero at every unextended trace step (except the last)
    prover._evaluate_constraints_columnar(evaluator, trace, debug_check=True)


def test_corrupted_trace_breaks_constraints():
    program = assembly.compile("begin push.3 push.5 add end")
    regs, ctx_depth, loop_depth = processor.execute(program, ProgramInputs.none())
    # corrupt one user-stack value mid-trace
    regs[16][7] = (regs[16][7] + 1) % (2**100)
    trace = TraceTable(regs, ctx_depth, loop_depth, 16)
    trace.extend()
    evaluator = Evaluator.from_trace(trace, b"\x11" * 32, [], [8])
    with pytest.raises(AssertionError):
        prover._evaluate_constraints_columnar(evaluator, trace, debug_check=True)
