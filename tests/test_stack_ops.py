"""Per-opcode stack unit tests with exact stack-state expectations.

Mirrors the reference's per-op test suite (src/processor/stack/tests/mod.rs,
tests/comparisons.rs, tests/conditional.rs - 764 LoC of expectations),
including the assertion-failure panic cases.  Where the reference draws
field::rand() operands we use fixed pseudo-random constants so runs are
reproducible; the assertions are value-exact either way.
"""

import pytest

from distaff_tpu.math import field
from distaff_tpu.utils import hasher
from distaff_tpu.processor.stack import Stack
from distaff_tpu.programs.inputs import ProgramInputs
from distaff_tpu.programs.opcodes import OpCode, OpHint
from distaff_tpu.config import HASH_STATE_WIDTH

TRACE_LENGTH = 16

# fixed stand-ins for the reference's field::rand() draws
RAND_A = 0x6C8F_2E41_9D35_7B0A_F1E4_8C29_5A76_3D18 % field.M
RAND_B = 0x2B91_C45E_7A08_3F6D_9E52_B17C_4068_D3A5 % field.M
RAND_X = 0x84D7_1F0B_3C69_E25A_47B8_0D93_6EF1_2C54 % field.M


def init_stack(public_inputs, secret_a, secret_b, trace_length=TRACE_LENGTH):
    """Mirrors reference tests/mod.rs:360-363."""
    inputs = ProgramInputs(public_inputs, secret_a, secret_b)
    return Stack(inputs, trace_length)


def state_at(stack, step):
    """Mirrors reference get_stack_state (tests/mod.rs:365-371)."""
    return [r[step] for r in stack.registers]


# ------------------------------------------------------------------------------------------------
# flow control ops (reference tests/mod.rs:14-56)
# ------------------------------------------------------------------------------------------------

def test_noop():
    stack = init_stack([1, 2, 3, 4], [], [])
    stack.execute(OpCode.Noop, OpHint.none())
    assert state_at(stack, 1) == [1, 2, 3, 4, 0, 0, 0, 0]
    assert stack.depth == 4
    assert stack.max_depth == 4


def test_assert():
    stack = init_stack([1, 2, 3, 4], [], [])
    stack.execute(OpCode.Assert, OpHint.none())
    assert state_at(stack, 1) == [2, 3, 4, 0, 0, 0, 0, 0]
    assert stack.depth == 3
    assert stack.max_depth == 4


def test_assert_fail():
    stack = init_stack([2, 3, 4], [], [])
    with pytest.raises(AssertionError, match="ASSERT failed at step 1"):
        stack.execute(OpCode.Assert, OpHint.none())


def test_asserteq():
    stack = init_stack([1, 1, 3, 4], [], [])
    stack.execute(OpCode.AssertEq, OpHint.none())
    assert state_at(stack, 1) == [3, 4, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 4


def test_asserteq_fail():
    stack = init_stack([2, 3, 4], [], [])
    with pytest.raises(AssertionError, match="ASSERTEQ failed at step 1"):
        stack.execute(OpCode.AssertEq, OpHint.none())


# ------------------------------------------------------------------------------------------------
# input ops (reference tests/mod.rs:61-103)
# ------------------------------------------------------------------------------------------------

def test_push():
    stack = init_stack([], [], [])
    stack.execute(OpCode.Push, OpHint.push_value(3))
    assert state_at(stack, 1) == [3, 0, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 1
    assert stack.max_depth == 1


def test_read():
    stack = init_stack([1], [2, 3], [])

    stack.execute(OpCode.Read, OpHint.none())
    assert state_at(stack, 1) == [2, 1, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 2

    stack.execute(OpCode.Read, OpHint.none())
    assert state_at(stack, 2) == [3, 2, 1, 0, 0, 0, 0, 0]
    assert stack.depth == 3
    assert stack.max_depth == 3


def test_read2():
    stack = init_stack([1], [2, 4], [3, 5])

    stack.execute(OpCode.Read2, OpHint.none())
    assert state_at(stack, 1) == [3, 2, 1, 0, 0, 0, 0, 0]
    assert stack.depth == 3
    assert stack.max_depth == 3

    stack.execute(OpCode.Read2, OpHint.none())
    assert state_at(stack, 2) == [5, 4, 3, 2, 1, 0, 0, 0]
    assert stack.depth == 5
    assert stack.max_depth == 5


# ------------------------------------------------------------------------------------------------
# stack manipulation ops (reference tests/mod.rs:108-216)
# ------------------------------------------------------------------------------------------------

def test_dup():
    stack = init_stack([1, 2], [], [])
    stack.execute(OpCode.Dup, OpHint.none())
    assert state_at(stack, 1) == [1, 1, 2, 0, 0, 0, 0, 0]
    assert stack.depth == 3
    assert stack.max_depth == 3


def test_dup2():
    stack = init_stack([1, 2, 3, 4], [], [])
    stack.execute(OpCode.Dup2, OpHint.none())
    assert state_at(stack, 1) == [1, 2, 1, 2, 3, 4, 0, 0]
    assert stack.depth == 6
    assert stack.max_depth == 6


def test_dup4():
    stack = init_stack([1, 2, 3, 4], [], [])
    stack.execute(OpCode.Dup4, OpHint.none())
    assert state_at(stack, 1) == [1, 2, 3, 4, 1, 2, 3, 4]
    assert stack.depth == 8
    assert stack.max_depth == 8


def test_pad2():
    stack = init_stack([1, 2], [], [])
    stack.execute(OpCode.Pad2, OpHint.none())
    assert state_at(stack, 1) == [0, 0, 1, 2, 0, 0, 0, 0]
    assert stack.depth == 4
    assert stack.max_depth == 4


def test_drop():
    stack = init_stack([1, 2], [], [])
    stack.execute(OpCode.Drop, OpHint.none())
    assert state_at(stack, 1) == [2, 0, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 1
    assert stack.max_depth == 2


def test_drop4():
    stack = init_stack([1, 2, 3, 4, 5], [], [])
    stack.execute(OpCode.Drop4, OpHint.none())
    assert state_at(stack, 1) == [5, 0, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 1
    assert stack.max_depth == 5


def test_swap():
    stack = init_stack([1, 2, 3, 4], [], [])
    stack.execute(OpCode.Swap, OpHint.none())
    assert state_at(stack, 1) == [2, 1, 3, 4, 0, 0, 0, 0]
    assert stack.depth == 4
    assert stack.max_depth == 4


def test_swap2():
    stack = init_stack([1, 2, 3, 4], [], [])
    stack.execute(OpCode.Swap2, OpHint.none())
    assert state_at(stack, 1) == [3, 4, 1, 2, 0, 0, 0, 0]
    assert stack.depth == 4
    assert stack.max_depth == 4


def test_swap4():
    stack = init_stack([1, 2, 3, 4, 5, 6, 7, 8], [], [])
    stack.execute(OpCode.Swap4, OpHint.none())
    assert state_at(stack, 1) == [5, 6, 7, 8, 1, 2, 3, 4]
    assert stack.depth == 8
    assert stack.max_depth == 8


def test_roll4():
    stack = init_stack([1, 2, 3, 4], [], [])
    stack.execute(OpCode.Roll4, OpHint.none())
    assert state_at(stack, 1) == [4, 1, 2, 3, 0, 0, 0, 0]
    assert stack.depth == 4
    assert stack.max_depth == 4


def test_roll8():
    stack = init_stack([1, 2, 3, 4, 5, 6, 7, 8], [], [])
    stack.execute(OpCode.Roll8, OpHint.none())
    assert state_at(stack, 1) == [8, 1, 2, 3, 4, 5, 6, 7]
    assert stack.depth == 8
    assert stack.max_depth == 8


# ------------------------------------------------------------------------------------------------
# arithmetic / boolean ops (reference tests/mod.rs:221-335)
# ------------------------------------------------------------------------------------------------

def test_add():
    stack = init_stack([1, 2], [], [])
    stack.execute(OpCode.Add, OpHint.none())
    assert state_at(stack, 1) == [3, 0, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 1
    assert stack.max_depth == 2


def test_mul():
    stack = init_stack([2, 3], [], [])
    stack.execute(OpCode.Mul, OpHint.none())
    assert state_at(stack, 1) == [6, 0, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 1
    assert stack.max_depth == 2


def test_inv():
    stack = init_stack([2, 3], [], [])
    stack.execute(OpCode.Inv, OpHint.none())
    assert state_at(stack, 1) == [field.inv(2), 3, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 2


def test_inv_zero():
    stack = init_stack([0], [], [])
    with pytest.raises(AssertionError, match="cannot compute INV of 0 at step 1"):
        stack.execute(OpCode.Inv, OpHint.none())


def test_neg():
    stack = init_stack([2, 3], [], [])
    stack.execute(OpCode.Neg, OpHint.none())
    assert state_at(stack, 1) == [field.neg(2), 3, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 2


def test_not():
    stack = init_stack([1, 2], [], [])
    stack.execute(OpCode.Not, OpHint.none())
    assert state_at(stack, 1) == [0, 2, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 2

    stack.execute(OpCode.Not, OpHint.none())
    assert state_at(stack, 2) == [1, 2, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 2


def test_not_fail():
    stack = init_stack([2, 3], [], [])
    with pytest.raises(AssertionError,
                       match="cannot compute NOT of a non-binary value at step 1"):
        stack.execute(OpCode.Not, OpHint.none())


def test_and():
    stack = init_stack([1, 1, 0], [], [])
    stack.execute(OpCode.And, OpHint.none())
    assert state_at(stack, 1) == [1, 0, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 3

    stack.execute(OpCode.And, OpHint.none())
    assert state_at(stack, 2) == [0, 0, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 1
    assert stack.max_depth == 3


def test_and_fail():
    stack = init_stack([1, 3], [], [])
    with pytest.raises(AssertionError,
                       match="cannot compute AND for a non-binary value at step 1"):
        stack.execute(OpCode.And, OpHint.none())


def test_or():
    stack = init_stack([0, 0, 1], [], [])
    stack.execute(OpCode.Or, OpHint.none())
    assert state_at(stack, 1) == [0, 1, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 3

    stack.execute(OpCode.Or, OpHint.none())
    assert state_at(stack, 2) == [1, 0, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 1
    assert stack.max_depth == 3


def test_or_fail():
    stack = init_stack([1, 3], [], [])
    with pytest.raises(AssertionError,
                       match="cannot compute OR for a non-binary value at step 1"):
        stack.execute(OpCode.Or, OpHint.none())


# ------------------------------------------------------------------------------------------------
# crypto ops (reference tests/mod.rs:340-355)
# ------------------------------------------------------------------------------------------------

def test_rescr():
    stack = init_stack([0, 0, 1, 2, 3, 4], [], [])
    expected = [0, 0, 1, 2, 3, 4, 0, 0]

    stack.execute(OpCode.RescR, OpHint.none())
    head = expected[:HASH_STATE_WIDTH]
    hasher.apply_round(head, 0)
    expected[:HASH_STATE_WIDTH] = head
    assert state_at(stack, 1) == expected

    stack.execute(OpCode.RescR, OpHint.none())
    head = expected[:HASH_STATE_WIDTH]
    hasher.apply_round(head, 1)
    expected[:HASH_STATE_WIDTH] = head
    assert state_at(stack, 2) == expected

    assert stack.depth == 6
    assert stack.max_depth == 6


# ------------------------------------------------------------------------------------------------
# selection ops (reference tests/conditional.rs)
# ------------------------------------------------------------------------------------------------

def test_choose():
    # choose on false
    stack = init_stack([2, 3, 0], [], [])
    stack.execute(OpCode.Choose, OpHint.none())
    assert state_at(stack, 1) == [3, 0, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 1
    assert stack.max_depth == 3

    stack = init_stack([2, 3, 0, 4], [], [])
    stack.execute(OpCode.Choose, OpHint.none())
    assert state_at(stack, 1) == [3, 4, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 4

    # choose on true
    stack = init_stack([2, 3, 1, 4], [], [])
    stack.execute(OpCode.Choose, OpHint.none())
    assert state_at(stack, 1) == [2, 4, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 4


def test_choose_fail():
    stack = init_stack([2, 3, 4], [], [])
    with pytest.raises(AssertionError, match="CHOOSE on a non-binary condition at step 1"):
        stack.execute(OpCode.Choose, OpHint.none())


def test_choose2():
    # choose on false
    stack = init_stack([2, 3, 4, 5, 0, 6, 7], [], [])
    stack.execute(OpCode.Choose2, OpHint.none())
    assert state_at(stack, 1) == [4, 5, 7, 0, 0, 0, 0, 0]
    assert stack.depth == 3
    assert stack.max_depth == 7

    # choose on true
    stack = init_stack([2, 3, 4, 5, 1, 6, 7], [], [])
    stack.execute(OpCode.Choose2, OpHint.none())
    assert state_at(stack, 1) == [2, 3, 7, 0, 0, 0, 0, 0]
    assert stack.depth == 3
    assert stack.max_depth == 7


def test_choose2_fail():
    stack = init_stack([2, 3, 4, 5, 6, 8, 8], [], [])
    with pytest.raises(AssertionError, match="CHOOSE2 on a non-binary condition at step 1"):
        stack.execute(OpCode.Choose2, OpHint.none())


def test_cswap2():
    # don't swap on false
    stack = init_stack([2, 3, 4, 5, 0, 6, 7], [], [])
    stack.execute(OpCode.CSwap2, OpHint.none())
    assert state_at(stack, 1) == [2, 3, 4, 5, 7, 0, 0, 0]
    assert stack.depth == 5
    assert stack.max_depth == 7

    # swap on true
    stack = init_stack([2, 3, 4, 5, 1, 6, 7], [], [])
    stack.execute(OpCode.CSwap2, OpHint.none())
    assert state_at(stack, 1) == [4, 5, 2, 3, 7, 0, 0, 0]
    assert stack.depth == 5
    assert stack.max_depth == 7


def test_cswap2_fail():
    stack = init_stack([2, 3, 4, 5, 6, 8, 8], [], [])
    with pytest.raises(AssertionError, match="CSWAP2 on a non-binary condition at step 1"):
        stack.execute(OpCode.CSwap2, OpHint.none())


# ------------------------------------------------------------------------------------------------
# equality (reference tests/comparisons.rs:8-45)
# ------------------------------------------------------------------------------------------------

def test_eq():
    inv_diff = field.inv(field.sub(1, 4))
    stack = init_stack([3, 3, 4, 5], [0, inv_diff], [])

    stack.execute(OpCode.Read, OpHint.none())
    stack.execute(OpCode.Eq, OpHint.none())
    assert state_at(stack, 2) == [1, 4, 5, 0, 0, 0, 0, 0]
    assert stack.depth == 3
    assert stack.max_depth == 5

    stack.execute(OpCode.Read, OpHint.none())
    stack.execute(OpCode.Eq, OpHint.none())
    assert state_at(stack, 4) == [0, 5, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 5


def test_eq_with_hint():
    # the EqStart hint derives the aux witness and pushes it onto tape A
    stack = init_stack([3, 3, 4, 5], [], [])

    stack.execute(OpCode.Read, OpHint.eq_start())
    stack.execute(OpCode.Eq, OpHint.none())
    assert state_at(stack, 2) == [1, 4, 5, 0, 0, 0, 0, 0]
    assert stack.depth == 3
    assert stack.max_depth == 5

    stack.execute(OpCode.Read, OpHint.eq_start())
    stack.execute(OpCode.Eq, OpHint.none())
    assert state_at(stack, 4) == [0, 5, 0, 0, 0, 0, 0, 0]
    assert stack.depth == 2
    assert stack.max_depth == 5


# ------------------------------------------------------------------------------------------------
# comparisons (reference tests/comparisons.rs:51-171)
# ------------------------------------------------------------------------------------------------

def _build_inputs_for_cmp(a, b, size):
    """LSB-first bit tapes, reversed (reference comparisons.rs:269-281)."""
    inputs_a = [(a >> i) & 1 for i in range(size)]
    inputs_b = [(b >> i) & 1 for i in range(size)]
    inputs_a.reverse()
    inputs_b.reverse()
    return inputs_a, inputs_b


def _run_cmp(a, b, size, use_hint=False):
    p_top = 1 << (size - 1)
    if use_hint:
        stack = init_stack([0, 0, 0, 0, 0, a, b], [], [], 256)
    else:
        inputs_a, inputs_b = _build_inputs_for_cmp(a, b, size)
        stack = init_stack([0, 0, 0, 0, 0, a, b], inputs_a, inputs_b, 256)
    stack.execute(OpCode.Pad2, OpHint.none())
    stack.execute(OpCode.Push, OpHint.push_value(p_top))

    for i in range(2, size + 2):
        hint = OpHint.cmp_start(size) if (use_hint and i == 2) else OpHint.none()
        stack.execute(OpCode.Cmp, hint)

        # invariant: next step's not_set = (1-gt)(1-lt) of this step
        state = state_at(stack, i)
        nxt = state_at(stack, i + 1)
        not_set = field.mul(field.sub(1, state[4]), field.sub(1, state[5]))
        assert nxt[3] == not_set

    # result registers: [gt, lt, b_acc, a_acc]
    state = state_at(stack, size + 2)
    lt = 1 if a < b else 0
    gt = 0 if a < b else 1
    assert state[4:8] == [gt, lt, b, a]


def test_cmp_128():
    _run_cmp(RAND_A, RAND_B, 128)


def test_cmp_64():
    _run_cmp(RAND_A & ((1 << 64) - 1), RAND_B & ((1 << 64) - 1), 64)


def test_cmp_128_with_hint():
    # CmpStart pushes both comparands' bit decompositions onto the tapes
    _run_cmp(RAND_A, RAND_B, 128, use_hint=True)


def _run_lt_gt(op, a, b):
    p127 = 1 << 127
    inputs_a, inputs_b = _build_inputs_for_cmp(a, b, 128)
    stack = init_stack([0, 0, 0, a, b, 7, 11], inputs_a, inputs_b, 256)
    stack.execute(OpCode.Pad2, OpHint.none())
    stack.execute(OpCode.Pad2, OpHint.none())
    stack.execute(OpCode.Push, OpHint.push_value(p127))
    for _ in range(3, 131):
        stack.execute(OpCode.Cmp, OpHint.none())

    # program finale (reference comparisons.rs:283-304)
    stack.execute(OpCode.Drop4, OpHint.none())
    stack.execute(OpCode.Pad2, OpHint.none())
    stack.execute(OpCode.Swap4, OpHint.none())
    stack.execute(OpCode.Roll4, OpHint.none())
    stack.execute(OpCode.AssertEq, OpHint.none())
    stack.execute(OpCode.AssertEq, OpHint.none())
    if op == "gt":
        stack.execute(OpCode.Roll4, OpHint.none())
    stack.execute(OpCode.Dup, OpHint.none())
    stack.execute(OpCode.Drop4, OpHint.none())

    state = state_at(stack, stack.step)
    if op == "lt":
        expected = 1 if a < b else 0
    else:
        expected = 1 if a > b else 0
    assert state == [expected, 7, 11] + [0] * (len(state) - 3)


def test_lt():
    _run_lt_gt("lt", RAND_A, RAND_B)


def test_gt():
    _run_lt_gt("gt", RAND_A, RAND_B)


# ------------------------------------------------------------------------------------------------
# binary aggregation (reference tests/comparisons.rs:177-265)
# ------------------------------------------------------------------------------------------------

def _run_binacc(x, size, use_hint=False):
    if use_hint:
        stack = init_stack([0, 0, 1, 0, x, 7, 11], [], [], 256)
    else:
        inputs_a = [(x >> (size - 1 - i)) & 1 for i in range(size)]
        inputs_a.reverse()
        stack = init_stack([0, 0, 1, 0, x, 7, 11], inputs_a, [], 256)

    for i in range(size):
        hint = OpHint.rc_start(size) if (use_hint and i == 0) else OpHint.none()
        stack.execute(OpCode.BinAcc, hint)

    stack.execute(OpCode.Drop, OpHint.none())
    stack.execute(OpCode.Drop, OpHint.none())
    stack.execute(OpCode.Drop, OpHint.none())
    state = state_at(stack, size + 3)
    assert state == [x, x, 7, 11] + [0] * (len(state) - 4)


def test_binacc_128():
    _run_binacc(RAND_X, 128)


def test_binacc_64():
    _run_binacc(RAND_X & ((1 << 64) - 1), 64)


def test_binacc_128_with_hint():
    # RcStart pushes the MSB-first bit decomposition onto tape A
    _run_binacc(RAND_X, 128, use_hint=True)


def test_isodd_128():
    x = RAND_X
    is_odd = x & 1
    inputs_a = [(x >> (127 - i)) & 1 for i in range(128)]
    inputs_a.reverse()
    stack = init_stack([0, 0, 1, 0, x, 7, 11], inputs_a, [], 256)

    # read the first bit and save it at the end of the stack
    stack.execute(OpCode.BinAcc, OpHint.none())
    stack.execute(OpCode.Swap2, OpHint.none())
    stack.execute(OpCode.Roll4, OpHint.none())
    stack.execute(OpCode.Dup, OpHint.none())

    for _ in range(127):
        stack.execute(OpCode.BinAcc, OpHint.none())

    stack.execute(OpCode.Drop, OpHint.none())
    stack.execute(OpCode.Drop, OpHint.none())
    stack.execute(OpCode.Swap, OpHint.none())
    stack.execute(OpCode.Roll4, OpHint.none())
    stack.execute(OpCode.AssertEq, OpHint.none())
    stack.execute(OpCode.Drop, OpHint.none())
    state = state_at(stack, 137)
    assert state == [is_odd, 7, 11] + [0] * (len(state) - 3)


# ------------------------------------------------------------------------------------------------
# pmpath hint machinery (reference stack/mod.rs:212-231)
# ------------------------------------------------------------------------------------------------

def test_read2_pmpath_start_interlaces_index_bits():
    # stack: [v0, v1, index]; tape A holds n-1 sibling values, tape B n-1;
    # PmpathStart(n) interlaces the index's n-1 bits (MSB first) with the
    # sibling values already on tape A
    n = 4
    index = 0b101  # 3 bits = n - 1
    sib_a = [11, 12, 13]
    sib_b = [21, 22, 23]
    stack = init_stack([5, 6, index], list(sib_a), list(sib_b), 64)

    stack.execute(OpCode.Read2, OpHint.pmpath_start(n))
    # tape A was [13, 12, 11] (reversed FIFO); interlacing rewrites it to
    # [bit2, 13, bit1, 12, bit0, 11] with the index bits MSB-first
    # (0b101 -> 1, 0, 1), and the READ2 then consumes the first (value)
    # entry a=11 together with b=21 from tape B, pushing (b, a) on top
    assert state_at(stack, 1) == [21, 11, 5, 6, index, 0, 0, 0]
    assert stack.tape_a == [1, 13, 0, 12, 1]
    assert stack.tape_b == [23, 22]

    # the next pop yields the interlaced LSB index bit (consumed by the
    # pmpath sub-cycle's bit READ2), then values/bits keep alternating
    stack.execute(OpCode.Read2, OpHint.none())
    s = state_at(stack, 2)
    assert s[0] == 22 and s[1] == 1  # (b=22 from tape B, bit0=1 from tape A)
    assert stack.tape_a == [1, 13, 0, 12]


def test_cmp_tape_underflow():
    stack = init_stack([0, 0, 0, 0, 0, 1, 2], [], [])
    stack.execute(OpCode.Pad2, OpHint.none())
    stack.execute(OpCode.Push, OpHint.push_value(1 << 127))
    with pytest.raises(AssertionError, match="empty tape A"):
        stack.execute(OpCode.Cmp, OpHint.none())


def test_binacc_tape_underflow():
    stack = init_stack([0, 0, 1, 0, 5], [], [])
    with pytest.raises(AssertionError, match="empty tape A"):
        stack.execute(OpCode.BinAcc, OpHint.none())


def test_read_tape_underflow():
    stack = init_stack([1], [], [])
    with pytest.raises(AssertionError, match="empty tape A"):
        stack.execute(OpCode.Read, OpHint.none())
