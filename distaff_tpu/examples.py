"""Example programs (reference src/examples/): each returns
(program, inputs, num_outputs, expected_result)."""

from .math import field
from .programs import ProgramInputs
from .programs import assembly


def fibonacci(n=6):
    """Compute the n-th Fibonacci term (reference examples/fibonacci.rs)."""
    program = assembly.compile(
        f"begin repeat.{n - 1} swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    n1, n2 = 0, 1
    for _ in range(n - 1):
        n1, n2 = n2, field.add(n1, n2)
    return program, inputs, 1, [n2]


def collatz(start=5):
    """Count Collatz steps from `start` (reference examples/collatz.rs)."""
    program = assembly.compile("""
    begin
        pad read dup push.1 ne
        while.true
            swap push.1 add swap dup isodd.128
            if.true
                push.3 mul push.1 add
            else
                push.2 div
            end
            dup push.1 ne
        end
        swap
    end""")
    inputs = ProgramInputs([], [start], [])
    value, steps = start, 0
    while value != 1:
        value = field.div(value, 2) if value % 2 == 0 else field.add(field.mul(value, 3), 1)
        steps += 1
    return program, inputs, 1, [steps]


def comparison(value=11):
    """Compare two secret values and select (reference examples/comparison.rs)."""
    program = assembly.compile("""
    begin
        read.ab dup.2 lt.128 if.true swap end
        dup.2 gt.128 if.true swap end
        choose
    end""")
    # simplified vs the reference's example but exercises lt/gt/choose
    a, b = value, value + 3
    inputs = ProgramInputs([], [a], [b])
    return program, inputs, 1, None  # expected computed by execution


def conditional(flag=1, a=13, b=29):
    """If/else branch selection (reference examples/conditional.rs)."""
    program = assembly.compile("""
    begin
        read if.true add else mul end
    end""")
    inputs = ProgramInputs([a, b], [flag], [])
    expected = field.add(a, b) if flag == 1 else field.mul(a, b)
    return program, inputs, 1, [expected]


def range_check(value=42, bits=63):
    """Check that a value fits in `bits` bits (reference examples/range.rs)."""
    program = assembly.compile(f"begin read rc.{bits} end")
    inputs = ProgramInputs([], [value], [])
    expected = 1 if value < (1 << bits) else 0
    return program, inputs, 1, [expected]


def merkle_path(index, leaf, path):
    """Verify a Merkle authentication path over secret tapes
    (reference examples/merkle.rs).  `path` is a list of (2-element) sibling
    digests bottom-up; leaf is a 2-element digest; index selects the leaf."""
    depth = len(path) + 1
    program = assembly.compile(f"begin smpath.{depth} end")
    # tape A/B: leaf then siblings, interleaved with index bits via read2 order
    tape_a = [leaf[0]]
    tape_b = [leaf[1]]
    idx_bits = [(index >> i) & 1 for i in range(len(path))]
    for bit, node in zip(idx_bits, path):
        tape_a.extend([bit, node[0]])
        tape_b.extend([node[1]])
    # smpath reads: read2 (node), swap2, read2 (bit in a, ...) per level
    inputs = ProgramInputs([], tape_a, tape_b)
    return program, inputs, 2, None


EXAMPLES = {
    "fibonacci": fibonacci,
    "collatz": collatz,
    "conditional": conditional,
    "rangecheck": range_check,
}
