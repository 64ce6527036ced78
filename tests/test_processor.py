"""Executor tests mirroring reference src/processor/mod.rs:190-346.

Each case checks trace geometry, final op counter, final trace-side program
hash vs the statically computed Program hash, terminal NOOP/VOID bit
patterns, and final user-stack state.
"""

from distaff_tpu.math import field
from distaff_tpu.programs import assembly, ProgramInputs
from distaff_tpu import processor


def _final_state(trace, ctx_depth, loop_depth):
    """Extract (op_counter, program_hash_bytes, cf, ld, hd, ctx, loop, stack) at last step."""
    last = len(trace[0]) - 1
    col = [r[last] for r in trace]
    op_counter = col[0]
    sponge = col[1:5]
    cf = col[5:8]
    ld = col[8:13]
    hd = col[13:15]
    ctx_end = 15 + ctx_depth
    loop_end = ctx_end + loop_depth
    ctx = col[15:ctx_end]
    loop = col[ctx_end:loop_end]
    stack = col[loop_end:]
    phash = field.to_bytes(sponge[0]) + field.to_bytes(sponge[1])
    return op_counter, phash, cf, ld, hd, ctx, loop, stack


def test_execute_span():
    program = assembly.compile("begin add push.5 mul push.7 end")
    inputs = ProgramInputs.from_public([1, 2])
    trace, ctx_depth, loop_depth = processor.execute(program, inputs)

    assert len(trace[0]) == 64
    assert len(trace) == 17
    opc, phash, cf, ld, hd, ctx, loop, stack = _final_state(trace, ctx_depth, loop_depth)
    assert opc == 46
    assert phash == program.hash
    assert cf == [1, 1, 1] and ld == [1, 1, 1, 1, 1] and hd == [1, 1]
    assert stack[:2] == [7, 15]


def test_execute_block():
    program = assembly.compile("begin add block push.5 mul push.7 end end")
    inputs = ProgramInputs.from_public([1, 2])
    trace, ctx_depth, loop_depth = processor.execute(program, inputs)

    assert len(trace[0]) == 64
    assert len(trace) == 18
    opc, phash, *_, stack = _final_state(trace, ctx_depth, loop_depth)
    assert opc == 60
    assert phash == program.hash
    assert stack[:2] == [7, 15]


def test_execute_if_else():
    program = assembly.compile(
        "begin read if.true add push.3 else push.7 add push.8 end mul end"
    )
    # true branch
    inputs = ProgramInputs([5, 3], [1], [])
    trace, ctx_depth, loop_depth = processor.execute(program, inputs)
    assert len(trace[0]) == 128 and len(trace) == 19
    opc, phash, *_, stack = _final_state(trace, ctx_depth, loop_depth)
    assert opc == 76 and phash == program.hash
    assert stack[0] == 24

    # false branch
    inputs = ProgramInputs([5, 3], [0], [])
    trace, ctx_depth, loop_depth = processor.execute(program, inputs)
    assert len(trace[0]) == 128 and len(trace) == 19
    opc, phash, *_, stack = _final_state(trace, ctx_depth, loop_depth)
    assert opc == 92 and phash == program.hash
    assert stack[:2] == [96, 3]


def test_execute_loop():
    program = assembly.compile("begin mul read while.true dup mul read end end")

    # don't enter the loop
    inputs = ProgramInputs([5, 3], [0], [])
    trace, ctx_depth, loop_depth = processor.execute(program, inputs)
    assert len(trace[0]) == 64 and len(trace) == 18
    opc, phash, *_, stack = _final_state(trace, ctx_depth, loop_depth)
    assert opc == 60 and phash == program.hash
    assert stack[0] == 15

    # one iteration
    inputs = ProgramInputs([5, 3], [1, 0], [])
    trace, ctx_depth, loop_depth = processor.execute(program, inputs)
    assert len(trace[0]) == 128 and len(trace) == 19
    opc, phash, *_, stack = _final_state(trace, ctx_depth, loop_depth)
    assert opc == 75 and phash == program.hash
    assert stack[0] == 225

    # five iterations
    inputs = ProgramInputs([5, 3], [1, 1, 1, 1, 1, 0], [])
    trace, ctx_depth, loop_depth = processor.execute(program, inputs)
    assert len(trace[0]) == 256 and len(trace) == 19
    opc, phash, *_, stack = _final_state(trace, ctx_depth, loop_depth)
    assert opc == 135 and phash == program.hash
    assert stack[0] == 43143988327398919500410556793212890625


def test_comparison_ops_execute():
    # gt/lt check "top value vs the following value": top=3, next=5
    program = assembly.compile("begin push.5 push.3 gt.8 end")
    trace, ctx_depth, loop_depth = processor.execute(program, ProgramInputs.none())
    *_, stack = _final_state(trace, ctx_depth, loop_depth)
    assert stack[0] == 0  # 3 > 5 is false

    program = assembly.compile("begin push.5 push.3 lt.8 end")
    trace, ctx_depth, loop_depth = processor.execute(program, ProgramInputs.none())
    *_, stack = _final_state(trace, ctx_depth, loop_depth)
    assert stack[0] == 1  # 3 < 5 is true


def test_hash_macro_matches_hasher():
    # hash.2 on stack [5, 3] runs 10 RescR rounds over state [0,0,0,0,5,3],
    # which is digest([3, 5])'s internal state; Drop4 leaves [S4, S5] while
    # digest returns the reversed prefix [S5, S4].
    from distaff_tpu.utils import hasher
    program = assembly.compile("begin push.3 push.5 hash.2 end")
    trace, ctx_depth, loop_depth = processor.execute(program, ProgramInputs.none())
    *_, stack = _final_state(trace, ctx_depth, loop_depth)
    d = hasher.digest([3, 5])
    assert stack[:2] == [d[1], d[0]]
