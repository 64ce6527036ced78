"""All example programs execute correctly through the VM (native when built).

Mirrors the reference's examples as executable specs; the merkle example
exercises smpath/pmpath with their full tape-hint machinery.
"""

import pytest

from distaff_tpu import examples, native, processor


@pytest.mark.parametrize("name", sorted(examples.EXAMPLES))
def test_example_executes(name):
    program, inputs, num_outputs, expected = examples.EXAMPLES[name]()
    if native.available():
        regs, cd, ld = native.execute(program, inputs)
    else:
        regs, cd, ld = processor.execute(program, inputs)
    last = len(regs[0]) - 1
    stack_start = 15 + cd + ld
    outputs = [regs[stack_start + i][last] for i in range(num_outputs)]
    if expected is not None:
        assert outputs == expected
