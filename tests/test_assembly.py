"""Assembly compiler golden tests (ported from reference
src/programs/assembly/tests.rs - compiled programs formatted for display
must match the reference's Debug output exactly)."""

import pytest

from distaff_tpu.programs import assembly


def test_single_block():
    program = assembly.compile("begin push.1 push.2 add end")
    expected = (
        "begin noop noop noop noop noop noop noop "
        "push(1) noop noop noop noop noop noop noop "
        "push(2) add noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop end"
    )
    assert repr(program) == expected


def test_sequence_of_blocks():
    program = assembly.compile(
        "begin block push.1 push.2 add end block push.3 push.4 add end end")
    expected = (
        "begin noop noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop block "
        "push(1) noop noop noop noop noop noop noop "
        "push(2) add noop noop noop noop noop end "
        "block push(3) noop noop noop noop noop noop "
        "noop push(4) add noop noop noop noop noop "
        "end end"
    )
    assert repr(program) == expected


def test_sequence_with_prefix_and_suffix():
    program = assembly.compile(
        "begin read read add block push.1 push.2 add end "
        "block push.3 push.4 sub end hash.2 end")
    expected = (
        "begin read read add noop noop noop noop "
        "noop noop noop noop noop noop noop block "
        "push(1) noop noop noop noop noop noop noop "
        "push(2) add noop noop noop noop noop end "
        "block push(3) noop noop noop noop noop noop "
        "noop push(4) neg add noop noop noop noop "
        "end pad2 pad2 noop noop noop noop noop "
        "noop noop noop noop noop noop noop noop "
        "noop rescr rescr rescr rescr rescr rescr rescr "
        "rescr rescr rescr drop4 noop noop noop noop "
        "end"
    )
    assert repr(program) == expected


def test_repeat_unrolls_with_merged_spans():
    p1 = assembly.compile("begin repeat.2 add mul end end")
    # repeat.2 unrolls into one merged span inside a group
    assert "block" in repr(p1)
    assert repr(p1).count("mul") == 2


@pytest.mark.parametrize("source,fragment", [
    ("begin end", "at least one instruction"),
    ("begin if.maybe add end end", "invalid block head"),
    ("begin repeat.1 add end end", "greater than 1"),
    ("begin swap.3 end", "allowed values"),
    ("begin gt.2 end", "between 4 and 128"),
])
def test_compile_errors(source, fragment):
    with pytest.raises(assembly.AssemblyError, match=fragment):
        assembly.compile(source)
