"""Per-family AIR constraint tests on scalar trace states (the analogue of
the reference's constraint-family tests, reference
constraints/decoder/flow_ops.rs:169-462 and decoder/sponge.rs:47-117):
valid transitions evaluate to zero for EVERY individual constraint, and
targeted corruptions make the matching constraint family nonzero.
"""

import pytest

from distaff_tpu import processor
from distaff_tpu.math import field
from distaff_tpu.programs import assembly, ProgramInputs
from distaff_tpu.programs.opcodes import FlowOps
from distaff_tpu.stark.trace_table import TraceTable
from distaff_tpu.stark.constraints.decoder_air import Decoder, NUM_OP_CONSTRAINTS
from distaff_tpu.stark.constraints.stack_air import Stack

M = field.M

PROGRAMS = [
    ("begin add block push.5 mul push.7 end end", ProgramInputs.from_public([1, 2])),
    ("begin read if.true add push.3 else push.7 add push.8 end mul end",
     ProgramInputs([5, 3], [0], [])),
    ("begin mul read while.true dup mul read end end", ProgramInputs([5, 3], [1, 1, 0], [])),
    ("begin push.3 push.5 hash.2 end", ProgramInputs.none()),
]


def _trace_and_airs(src, inputs):
    program = assembly.compile(src)
    regs, ctx_depth, loop_depth = processor.execute(program, inputs)
    trace = TraceTable(regs, ctx_depth, loop_depth, 16)
    decoder = Decoder(trace.unextended_length(), 1, ctx_depth, loop_depth)
    stack = Stack(trace.unextended_length(), 1, trace.stack_depth)
    return trace, decoder, stack


@pytest.mark.parametrize("src,inputs", PROGRAMS)
def test_every_constraint_vanishes_on_valid_transitions(src, inputs):
    trace, decoder, stack = _trace_and_airs(src, inputs)
    for step in range(trace.unextended_length() - 1):
        current = trace.get_state(step)
        next_state = trace.get_state(step + 1)

        d = [0] * decoder.constraint_count()
        decoder.evaluate(current, next_state, step, d)
        assert all(v == 0 for v in d), (
            f"decoder constraint nonzero at step {step}: "
            f"{[i for i, v in enumerate(d) if v != 0]}")

        s = [0] * stack.constraint_count()
        stack.evaluate(current, next_state, step, s)
        assert all(v == 0 for v in s), (
            f"stack constraint nonzero at step {step}: "
            f"{[i for i, v in enumerate(s) if v != 0]}")


def _find_step(trace, flow_op):
    """First step whose cf flags select the given flow op."""
    for step in range(trace.unextended_length() - 1):
        state = trace.get_state(step)
        if state.cf_op_flags()[flow_op.op_index()] == 1:
            return step
    return None


def test_corrupted_sponge_breaks_hacc():
    trace, decoder, _ = _trace_and_airs(*PROGRAMS[0])
    step = _find_step(trace, FlowOps.Hacc)
    assert step is not None
    current = trace.get_state(step)
    next_state = trace.get_state(step + 1)
    next_state.sponge[0] = (next_state.sponge[0] + 1) % M

    d = [0] * decoder.constraint_count()
    decoder.evaluate(current, next_state, step, d)
    hacc_slots = d[NUM_OP_CONSTRAINTS : NUM_OP_CONSTRAINTS + 4]
    assert any(v != 0 for v in hacc_slots)


def test_corrupted_ctx_stack_breaks_begin():
    # the BEGIN transition must push the parent hash onto the context stack
    trace, decoder, _ = _trace_and_airs(*PROGRAMS[0])
    step = _find_step(trace, FlowOps.Begin)
    assert step is not None
    current = trace.get_state(step)
    next_state = trace.get_state(step + 1)
    next_state.ctx_stack[0] = (next_state.ctx_stack[0] + 1) % M

    d = [0] * decoder.constraint_count()
    decoder.evaluate(current, next_state, step, d)
    ctx_slots = d[NUM_OP_CONSTRAINTS + 5 :]
    assert any(v != 0 for v in ctx_slots)


def test_corrupted_op_counter_detected():
    trace, decoder, _ = _trace_and_airs(*PROGRAMS[0])
    step = _find_step(trace, FlowOps.Hacc)
    current = trace.get_state(step)
    next_state = trace.get_state(step + 1)
    next_state.op_counter = (next_state.op_counter + 1) % M

    d = [0] * decoder.constraint_count()
    decoder.evaluate(current, next_state, step, d)
    assert d[10] != 0  # op_counter increment constraint


def test_corrupted_stack_result_detected():
    # corrupting the result of a user op must break a stack constraint
    trace, decoder, stack = _trace_and_airs(*PROGRAMS[0])
    for step in range(trace.unextended_length() - 1):
        current = trace.get_state(step)
        next_state = trace.get_state(step + 1)
        if current.cf_op_flags()[FlowOps.Hacc.op_index()] != 1:
            continue
        if current.noop_flag() == 1:
            continue
        next_state.user_stack[0] = (next_state.user_stack[0] + 1) % M
        s = [0] * stack.constraint_count()
        stack.evaluate(current, next_state, step, s)
        assert any(v != 0 for v in s), f"corruption undetected at step {step}"
        return
    pytest.fail("no user op step found")


def test_nonbinary_op_bit_detected():
    trace, decoder, _ = _trace_and_airs(*PROGRAMS[0])
    current = trace.get_state(0)
    next_state = trace.get_state(1)
    current.cf_op_bits[0] = 2
    current._flags = None  # invalidate the lazy flag cache

    d = [0] * decoder.constraint_count()
    decoder.evaluate(current, next_state, 0, d)
    assert d[0] != 0  # binariness of cf bit 0
