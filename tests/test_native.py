"""Native (C++) layer parity vs the pure-Python implementations."""

import numpy as np
import pytest

from distaff_tpu import native, processor
from distaff_tpu.programs import assembly, ProgramInputs
from distaff_tpu.crypto.blake3 import _blake3_batch_numpy
from distaff_tpu.crypto import merkle

pytestmark = pytest.mark.skipif(not native.available(), reason="native library not built")


def test_blake3_parity():
    rng = np.random.default_rng(0)
    for length in [32, 64, 272, 1024, 2048]:
        data = rng.integers(0, 256, size=(17, length), dtype=np.uint8)
        assert np.array_equal(native.blake3_batch(data), _blake3_batch_numpy(data))


def test_merkle_nodes_parity():
    rng = np.random.default_rng(1)
    leaves = rng.integers(0, 256, size=(256, 32), dtype=np.uint8)
    tree = merkle.MerkleTree(leaves, "blake3")  # native node construction
    proof = tree.prove_batch([3, 77, 200])
    assert merkle.MerkleTree.verify_batch(tree.root(), [3, 77, 200], proof, "blake3")
    # root must equal the scalar recomputation
    import functools
    from distaff_tpu.crypto.hashes import blake3 as b3
    level = [leaves[i].tobytes() for i in range(256)]
    while len(level) > 1:
        level = [b3(level[i] + level[i + 1]) for i in range(0, len(level), 2)]
    assert tree.root() == level[0]


@pytest.mark.parametrize("src,inputs", [
    ("begin push.3 push.5 add end", ProgramInputs.none()),
    ("begin read if.true add push.3 else push.7 add push.8 end mul end",
     ProgramInputs([5, 3], [1], [])),
    ("begin mul read while.true dup mul read end end", ProgramInputs([5, 3], [1, 1, 0], [])),
    ("begin push.5 push.3 gt.8 end", ProgramInputs.none()),
    ("begin push.3 push.5 hash.2 end", ProgramInputs.none()),
    ("begin read rc.16 end", ProgramInputs([], [42], [])),
])
def test_vm_parity(src, inputs):
    program = assembly.compile(src)
    py_trace, py_ctx, py_loop = processor.execute(program, inputs)
    nat_trace, nat_ctx, nat_loop = native.execute(program, inputs)
    assert (py_ctx, py_loop) == (nat_ctx, nat_loop)
    assert py_trace == nat_trace


def test_vm_runtime_failure():
    program = assembly.compile("begin push.0 assert end")
    with pytest.raises(AssertionError):
        native.execute(program, ProgramInputs.none())


def test_native_sponge_rounds():
    if not native.available():
        import pytest
        pytest.skip("native library not built")
    from distaff_tpu.utils import sponge
    from distaff_tpu.math import field

    state = [3, 5, 7, 11]
    ops = [96, 97, 98, 15, 247]        # arbitrary op codes incl. PUSH-like
    vals = [0, 0, field.M - 1, 123456789, 0]
    expected = list(state)
    for i, (op, v) in enumerate(zip(ops, vals)):
        sponge.apply_round(expected, op, v, 2 + i)
    got = native.sponge_rounds(state, ops, vals, 2)
    assert got == expected
