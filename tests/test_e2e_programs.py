"""Feature-program end-to-end prove -> verify tests.

Mirrors the reference's integration suite (src/tests/mod.rs:11-335 and
src/tests/comparisons.rs:7-120): each test builds a raw-opcode program,
proves it, checks the exact outputs, and verifies the proof.  The reference
runs these at default options; we use small options (ext=16, 10 queries) so
the whole suite stays fast - the protocol path exercised is identical.
"""

import pytest

import distaff_tpu
from distaff_tpu import ProgramInputs, ProofOptions
from distaff_tpu.math import field
from distaff_tpu.utils import hasher
from distaff_tpu.programs import Program
from distaff_tpu.programs.blocks import Span, Group
from distaff_tpu.programs.opcodes import OpCode, OpHint

pytestmark = pytest.mark.heavy  # full proofs / mesh / compile-heavy

OPTIONS = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=2)

# fixed stand-ins for the reference's field::rand() draws
RAND_A = 0x3A17_D4C8_0B5E_92F6_61AD_7E03_C5B8_4F29 % field.M
RAND_B = 0x9F60_2B8D_E7A1_35C4_08E9_52F7_1D6A_B083 % field.M


def build_program(instructions, push_values=()):
    """Raw-opcode program builder (reference src/tests/mod.rs:317-335)."""
    hints = {}
    j = 0
    for i, op in enumerate(instructions):
        if op == OpCode.Push:
            hints[i] = OpHint.push_value(push_values[j])
            j += 1
    assert j == len(push_values), "push value count mismatch"
    return Program(Group([Span(list(instructions), hints)]))


def prove_and_verify(program, inputs, num_outputs, expected):
    outputs, proof = distaff_tpu.execute(program, inputs, num_outputs, OPTIONS)
    assert outputs == expected
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs, proof)
    return proof


def test_execute_verify():
    # reference src/tests/mod.rs:11-29
    program = build_program([
        OpCode.Begin, OpCode.Swap, OpCode.Dup2, OpCode.Drop,
        OpCode.Add,   OpCode.Swap, OpCode.Dup2, OpCode.Drop,
        OpCode.Add,   OpCode.Swap, OpCode.Dup2, OpCode.Drop,
        OpCode.Add,   OpCode.Noop, OpCode.Noop,
    ])
    prove_and_verify(program, ProgramInputs.from_public([1, 0]), 1, [3])


def test_stack_manipulation():
    # reference src/tests/mod.rs:66-91
    program = build_program([
        OpCode.Begin, OpCode.Noop,  OpCode.Noop,  OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,  OpCode.Noop,  OpCode.Noop,
        OpCode.Swap,  OpCode.Swap2, OpCode.Swap4, OpCode.Roll4,
        OpCode.Roll8, OpCode.Dup,   OpCode.Add,   OpCode.Pad2,
        OpCode.Push,  OpCode.Swap4, OpCode.Drop4, OpCode.Dup2,
        OpCode.Swap4, OpCode.Add,   OpCode.Add,   OpCode.Dup4,
        OpCode.Push,  OpCode.Add,   OpCode.Add,   OpCode.Add,
        OpCode.Add,   OpCode.Noop,  OpCode.Noop,
    ], [11, 12])
    inputs = ProgramInputs.from_public([7, 6, 5, 4, 3, 2, 1, 0])
    prove_and_verify(program, inputs, 8, [46, 19, 4, 11, 0, 11, 0, 6])


def test_conditional_choose():
    # reference src/tests/mod.rs:93-110
    program = build_program([
        OpCode.Begin, OpCode.Choose, OpCode.Choose, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,   OpCode.Noop,   OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,   OpCode.Noop,   OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,   OpCode.Noop,
    ])
    inputs = ProgramInputs.from_public([3, 4, 1, 5, 0, 6, 7, 8])
    prove_and_verify(program, inputs, 8, [5, 6, 7, 8, 0, 0, 0, 0])


def test_conditional_choose2():
    # reference src/tests/mod.rs:112-131
    program = build_program([
        OpCode.Begin, OpCode.Noop,    OpCode.Noop,    OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,    OpCode.Noop,    OpCode.Noop,
        OpCode.Push,  OpCode.Noop,    OpCode.Noop,    OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,    OpCode.Noop,    OpCode.Noop,
        OpCode.Push,  OpCode.Choose2, OpCode.Choose2, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,    OpCode.Noop,    OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,    OpCode.Noop,    OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,    OpCode.Noop,
    ], [3, 4])
    inputs = ProgramInputs.from_public([5, 6, 1, 0, 7, 8, 0, 0])
    prove_and_verify(program, inputs, 8, [7, 8, 0, 0, 0, 0, 0, 0])


def test_conditional_cswap2():
    # reference src/tests/mod.rs:133-150
    program = build_program([
        OpCode.Begin,  OpCode.CSwap2, OpCode.Pad2, OpCode.Swap4,
        OpCode.CSwap2, OpCode.Noop,   OpCode.Noop, OpCode.Noop,
        OpCode.Noop,   OpCode.Noop,   OpCode.Noop, OpCode.Noop,
        OpCode.Noop,   OpCode.Noop,   OpCode.Noop,
    ])
    inputs = ProgramInputs.from_public([3, 4, 1, 2, 1, 0, 5, 6])
    prove_and_verify(program, inputs, 8, [3, 4, 5, 6, 1, 2, 0, 0])


def test_selection_operations_panic():
    # reference src/tests/mod.rs:152-167
    program = build_program([
        OpCode.Begin, OpCode.Choose, OpCode.Choose, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,   OpCode.Noop,   OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,   OpCode.Noop,   OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,   OpCode.Noop,
    ])
    inputs = ProgramInputs.from_public([3, 4, 2, 5, 0, 6, 7, 8])
    # message differs between the Python executor ("CHOOSE on a non-binary
    # condition at step 2") and the native VM ("CHOOSE non-binary")
    with pytest.raises(AssertionError, match="CHOOSE.*non-binary"):
        distaff_tpu.execute(program, inputs, 8, OPTIONS)


def test_math_operations():
    # reference src/tests/mod.rs:169-189
    program = build_program([
        OpCode.Begin, OpCode.Add,  OpCode.Mul,  OpCode.Inv,
        OpCode.Neg,   OpCode.Swap, OpCode.Not,  OpCode.Noop,
        OpCode.Noop,  OpCode.Noop, OpCode.Noop, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop, OpCode.Noop,
    ])
    inputs = ProgramInputs.from_public([7, 6, 5, 0, 2, 3])
    prove_and_verify(program, inputs, 2, [1, field.neg(field.inv(65))])


def test_bool_operations():
    # reference src/tests/mod.rs:191-210
    program = build_program([
        OpCode.Begin, OpCode.Not,  OpCode.Or,   OpCode.Or,
        OpCode.And,   OpCode.And,  OpCode.Not,  OpCode.Noop,
        OpCode.Noop,  OpCode.Noop, OpCode.Noop, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop, OpCode.Noop,
    ])
    inputs = ProgramInputs.from_public([1, 0, 1, 1, 0])
    prove_and_verify(program, inputs, 1, [1])


def test_hash_operations_single():
    # reference src/tests/mod.rs:213-238
    program = build_program(
        [OpCode.Begin] + [OpCode.Noop] * 15
        + [OpCode.RescR] * 10
        + [OpCode.Drop] * 4 + [OpCode.Noop])
    expected = list(reversed(hasher.digest([1, 2, 3, 4])))
    inputs = ProgramInputs.from_public([0, 0, 4, 3, 2, 1])
    prove_and_verify(program, inputs, 2, expected)


def test_hash_operations_double():
    # reference src/tests/mod.rs:240-272
    program = build_program(
        [OpCode.Begin] + [OpCode.Noop] * 15
        + [OpCode.RescR] * 10 + [OpCode.Drop4, OpCode.Noop]
        + [OpCode.Pad2, OpCode.Dup2, OpCode.Noop, OpCode.Noop]
        + [OpCode.RescR] * 10 + [OpCode.Drop4]
        + [OpCode.Noop] * 4)
    once = hasher.digest([1, 2, 3, 4])
    expected = list(reversed(hasher.digest(once)))
    inputs = ProgramInputs.from_public([0, 0, 4, 3, 2, 1])
    prove_and_verify(program, inputs, 2, expected)


def test_read_operations():
    # reference src/tests/mod.rs:274-292
    program = build_program([
        OpCode.Begin, OpCode.Read, OpCode.Read2, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop, OpCode.Noop,  OpCode.Noop,
        OpCode.Push,  OpCode.Noop, OpCode.Noop,  OpCode.Noop,
        OpCode.Noop,  OpCode.Noop, OpCode.Noop,
    ], [5])
    inputs = ProgramInputs([1], [2, 3], [4])
    prove_and_verify(program, inputs, 5, [5, 4, 3, 2, 1])


def test_assert_operations():
    # reference src/tests/mod.rs:294-313
    program = build_program([
        OpCode.Begin, OpCode.Assert, OpCode.Noop, OpCode.AssertEq,
        OpCode.Noop,  OpCode.Noop,   OpCode.Noop, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,   OpCode.Noop, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop,   OpCode.Noop,
    ])
    inputs = ProgramInputs.from_public([1, 3, 3])
    prove_and_verify(program, inputs, 2, [0, 0])


def test_eq_operations():
    # reference src/tests/comparisons.rs:8-28
    program = build_program([
        OpCode.Begin, OpCode.Read, OpCode.Eq,   OpCode.Swap2,
        OpCode.Read,  OpCode.Eq,   OpCode.Noop, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop, OpCode.Noop, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop, OpCode.Noop,
    ])
    diff_inv = field.inv(field.sub(1, 2))
    inputs = ProgramInputs([1, 2, 3, 4, 4], [diff_inv, 1], [])
    prove_and_verify(program, inputs, 3, [1, 0, 3])


def test_cmp_operation():
    # reference src/tests/comparisons.rs:31-67
    a, b = RAND_A, RAND_B
    inputs_a = [(a >> i) & 1 for i in range(128)][::-1]
    inputs_b = [(b >> i) & 1 for i in range(128)][::-1]

    instructions = [
        OpCode.Begin, OpCode.Pad2, OpCode.Noop, OpCode.Noop,
        OpCode.Noop,  OpCode.Noop, OpCode.Noop, OpCode.Noop,
        OpCode.Push,
    ] + [OpCode.Cmp] * 128 + [OpCode.Drop4]
    instructions += [OpCode.Noop] * (255 - len(instructions))

    program = build_program(instructions, [1 << 127])
    inputs = ProgramInputs([0, 0, 0, 0, 0, a, b], inputs_a, inputs_b)
    lt = 1 if a < b else 0
    gt = 0 if a < b else 1
    prove_and_verify(program, inputs, 4, [gt, lt, b, a])


def test_binacc_operation():
    # reference src/tests/comparisons.rs:70-104
    a = RAND_A
    inputs_a = [(a >> (127 - i)) & 1 for i in range(128)][::-1]

    instructions = [OpCode.Begin] + [OpCode.BinAcc] * 128 + [OpCode.Drop] * 3
    instructions += [OpCode.Noop] * (255 - len(instructions))

    program = build_program(instructions)
    inputs = ProgramInputs([0, 0, 1, 0, a], inputs_a, [])
    prove_and_verify(program, inputs, 2, [a, a])
