"""Independent trace-side program-hash traversal cross-checked against the
static Program.hash.

This re-implements, from the spec, the dynamic hash computation a VM trace
performs while executing a block tree (BEGIN/TEND/FEND/LOOP/WRAP/BREAK step
accounting plus hacc merges), and asserts it reproduces the compile-time
hash for every block shape - mirroring the reference's independent
re-implementation in src/programs/tests/utils.rs:9-148 and the scenarios in
src/programs/tests/mod.rs:11-159 (including the expected step counts).
"""

from distaff_tpu.programs import Program
from distaff_tpu.programs.blocks import Span, Group, Switch, Loop
from distaff_tpu.programs.hashing import hash_op
from distaff_tpu.programs.opcodes import OpCode
from distaff_tpu.config import HACC_NUM_ROUNDS

NOOP = int(OpCode.Noop)


# ------------------------------------------------------------------------------------------------
# independent traversal (mirrors reference tests/utils.rs)
# ------------------------------------------------------------------------------------------------

def traverse(blocks, stack, hash_state, step):
    first = blocks[0]
    assert isinstance(first, Span), "first block in a sequence must be a Span"
    step = _traverse_span(first, hash_state, True, step)

    for block in blocks[1:]:
        if isinstance(block, Span):
            step = _traverse_span(block, hash_state, False, step)
        elif isinstance(block, Group):
            step += 1  # BEGIN
            state = [0, 0, 0, 0]
            step = traverse(block.body, stack, state, step)
            step = close_block(state, hash_state[0], 0, True, step)
            hash_state[:] = state
        elif isinstance(block, Switch):
            step += 1  # BEGIN
            state = [0, 0, 0, 0]
            condition = stack.pop()
            if condition == 1:
                step = traverse(block.t_branch, stack, state, step)
                step = close_block(
                    state, hash_state[0], block.false_branch_hash(), True, step)
            elif condition == 0:
                step = traverse(block.f_branch, stack, state, step)
                step = close_block(
                    state, hash_state[0], block.true_branch_hash(), False, step)
            else:
                raise AssertionError("non-binary switch condition")
            hash_state[:] = state
        elif isinstance(block, Loop):
            condition = stack.pop()
            if condition == 0:
                step += 1  # BEGIN
                state = [0, 0, 0, 0]
                step = traverse(block.skip, stack, state, step)
                step = close_block(
                    state, hash_state[0], block.body_hash(), False, step)
                hash_state[:] = state
            elif condition == 1:
                step = _traverse_loop(block, hash_state, stack, step)
            else:
                raise AssertionError("non-binary loop condition")
        else:
            raise AssertionError(f"unknown block type {type(block)}")
    return step


def _traverse_span(block, hash_state, is_first, step):
    if not is_first:
        hash_op(hash_state, NOOP, 0, step)
        step += 1
    for i in range(block.length()):
        op, hint = block.get_op(i)
        hash_op(hash_state, int(op), hint.op_value(), step)
        step += 1
    return step


def close_block(hash_state, parent_hash, sibling_hash, is_true_branch, step):
    hash_op(hash_state, NOOP, 0, step)
    step += 1
    step += 1  # TEND / FEND

    if is_true_branch:
        hash_state[1] = hash_state[0]
        hash_state[0] = parent_hash
        hash_state[2] = sibling_hash
        hash_state[3] = 0
    else:
        hash_state[2] = hash_state[0]
        hash_state[0] = parent_hash
        hash_state[1] = sibling_hash
        hash_state[3] = 0

    for _ in range(HACC_NUM_ROUNDS):
        hash_op(hash_state, NOOP, 0, step)
        step += 1
    return step


def _traverse_loop(block, hash_state, stack, step):
    step += 1  # LOOP
    state = [0, 0, 0, 0]
    while True:
        step = traverse(block.body, stack, state, step)
        condition = stack.pop()
        assert state[0] == block.image(), "loop image mismatch"
        if condition == 0:
            step += 1  # BREAK
            break
        elif condition == 1:
            state = [0, 0, 0, 0]
            step += 1  # WRAP
        else:
            raise AssertionError("non-binary loop condition")

    skip_first = block.skip[0]
    assert isinstance(skip_first, Span)
    step = _traverse_span(skip_first, state, True, step)
    step = close_block(state, hash_state[0], block.skip_hash(), True, step)
    hash_state[:] = state
    return step


def hash_to_bytes(hash_state):
    return b"".join(v.to_bytes(16, "little") for v in hash_state[:2])


def first_block(op, length=15):
    ops = [op] * length
    ops[0] = OpCode.Begin
    return Span(ops)


def check(program, stack, expected_steps):
    # conditions pop LIFO from the end, matching the reference's Vec::pop
    state = [0, 0, 0, 0]
    step = traverse(program.root.body, list(stack), state, 0)
    step = close_block(state, 0, 0, True, step)
    assert program.hash == hash_to_bytes(state)
    assert step == expected_steps


# ------------------------------------------------------------------------------------------------
# scenarios (mirror reference tests/mod.rs:11-159)
# ------------------------------------------------------------------------------------------------

def test_single_block():
    program = Program(Group([first_block(OpCode.Noop)]))
    check(program, [], 31)


def test_linear_blocks():
    block1 = first_block(OpCode.Noop)
    block2 = Group([Span([OpCode.Add] * 15)])
    block3 = Group([Span([OpCode.Mul] * 15)])

    # sequence ending with a group block
    program = Program(Group([block1, block2, block3]))
    check(program, [], 95)

    # sequence ending with a span block
    block4 = Span([OpCode.Inv] * 15)
    program = Program(Group([block1, block2, block3, block4]))
    check(program, [], 111)


def test_nested_blocks():
    block1 = first_block(OpCode.Noop)
    block2 = Group([Span([OpCode.Add] * 15)])
    inner = Group([Span([OpCode.Inv] * 15)])
    block3 = Group([Span([OpCode.Mul] * 15), inner])
    program = Program(Group([block1, block2, block3]))
    check(program, [], 127)


def test_conditional_program():
    block1 = first_block(OpCode.Noop)
    t_branch = [Span([OpCode.Assert] + [OpCode.Add] * 14)]
    f_branch = [Span([OpCode.Not, OpCode.Assert] + [OpCode.Mul] * 13)]
    program = Program(Group([block1, Switch(t_branch, f_branch)]))

    check(program, [1], 63)   # true branch
    check(program, [0], 63)   # false branch


def test_simple_loop():
    block1 = first_block(OpCode.Noop)
    body = [Span([OpCode.Assert] + [OpCode.Add] * 14)]
    program = Program(Group([block1, Loop(body)]))

    # conditions pop LIFO: [0, 1] enters the loop once, then exits on 0
    check(program, [0], 63)            # loop not entered
    check(program, [0, 1], 79)         # executed once
    check(program, [0, 1, 1, 1], 111)  # executed 3 times
