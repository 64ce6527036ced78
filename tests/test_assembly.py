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


def test_single_if_else():
    # reference assembly/tests.rs:76-102
    program = assembly.compile("""
    begin
        push.3
        push.5
        read
        if.true
            add dup mul
        else
            mul dup add
        end
    end""")
    expected = (
        "begin noop noop noop noop noop noop noop "
        "push(3) noop noop noop noop noop noop noop "
        "push(5) read noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop if "
        "assert add dup mul noop noop noop noop "
        "noop noop noop noop noop noop noop else "
        "not assert mul dup add noop noop noop "
        "noop noop noop noop noop noop noop end "
        "end"
    )
    assert repr(program) == expected


def test_single_if_else_with_suffix():
    # reference assembly/tests.rs:104-140
    program = assembly.compile("""
    begin
        push.3
        push.5
        read
        if.true
            add dup mul
        else
            mul dup add
        end
        rc.16
    end""")
    expected = (
        "begin "
        "noop noop noop noop noop noop noop "
        "push(3) noop noop noop noop noop noop noop "
        "push(5) read noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "if "
        "assert add dup mul noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "else "
        "not assert mul dup add noop noop noop "
        "noop noop noop noop noop noop noop "
        "end "
        "pad2 noop noop noop noop noop noop noop "
        "push(1) swap dup binacc.16 binacc binacc binacc binacc "
        "binacc binacc binacc binacc binacc binacc binacc binacc "
        "binacc binacc binacc dup drop4 read::eq eq "
        "end"
    )
    assert repr(program) == expected


def test_nested_if_else():
    # reference assembly/tests.rs:142-182
    program = assembly.compile("""
    begin
        push.3
        push.5
        read
        if.true
            add dup mul eq
            if.true
                not push.6 mul
            end
        else
            mul dup add
        end
    end""")
    expected = (
        "begin noop noop noop noop noop noop noop "
        "push(3) noop noop noop noop noop noop noop "
        "push(5) read noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "if "
        "assert add dup mul read::eq eq noop noop "
        "noop noop noop noop noop noop noop "
        "if "
        "assert not noop noop noop noop noop noop "
        "push(6) mul noop noop noop noop noop "
        "else "
        "not assert noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "end "
        "else "
        "not assert mul dup add noop noop noop "
        "noop noop noop noop noop noop noop "
        "end "
        "end"
    )
    assert repr(program) == expected


def test_single_loop():
    # reference assembly/tests.rs:186-211
    program = assembly.compile("""
    begin
        push.3
        push.5
        read
        while.true
            add dup mul read.ab
        end
    end""")
    expected = (
        "begin noop noop noop noop noop noop noop "
        "push(3) noop noop noop noop noop noop noop "
        "push(5) read noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "while "
        "assert add dup mul read2 noop noop noop "
        "noop noop noop noop noop noop noop "
        "end "
        "end"
    )
    assert repr(program) == expected


def test_loop_with_suffix_and_nested_if_else():
    # reference assembly/tests.rs:213-251
    program = assembly.compile("""
    begin
        push.3
        push.5
        read
        while.true
            add dup mul read.ab
            if.true
                push.6 sub
            end
            push.7 add
        end
    end""")
    expected = (
        "begin noop noop noop noop noop noop noop "
        "push(3) noop noop noop noop noop noop noop "
        "push(5) read noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "while "
        "assert add dup mul read2 noop noop noop "
        "noop noop noop noop noop noop noop "
        "if "
        "assert noop noop noop noop noop noop noop "
        "push(6) neg add noop noop noop noop "
        "else "
        "not assert noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "end "
        "push(7) add noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "end "
        "end"
    )
    assert repr(program) == expected


def test_repeat_2_spans():
    # reference assembly/tests.rs:256-280
    program = assembly.compile("""
    begin
        read read add read eq
        repeat.2
            push.3 add
        end
    end""")
    expected = (
        "begin "
        "read read add read read::eq eq noop "
        "noop noop noop noop noop noop noop "
        "block "
        "push(3) add noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop noop "
        "push(3) add noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "end "
        "end"
    )
    assert repr(program) == expected


def test_repeat_5_spans():
    # reference assembly/tests.rs:282-312
    program = assembly.compile("""
    begin
        read read add read eq
        repeat.5
            push.3 add
        end
    end""")
    body = (
        "push(3) add noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop noop "
    ) * 4 + (
        "push(3) add noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
    )
    expected = (
        "begin "
        "read read add read read::eq eq noop "
        "noop noop noop noop noop noop noop "
        "block " + body + "end "
        "end"
    )
    assert repr(program) == expected


def test_repeat_2_blocks():
    # reference assembly/tests.rs:314-355
    program = assembly.compile("""
    begin
        read read add read eq
        repeat.2
            read
            if.true
                push.3 add mul
            end
        end
    end""")
    unit = (
        "read noop noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "if "
        "assert noop noop noop noop noop noop noop "
        "push(3) add mul noop noop noop noop "
        "else "
        "not assert noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "end "
    )
    expected = (
        "begin "
        "read read add read read::eq eq noop "
        "noop noop noop noop noop noop noop "
        "block " + unit * 2 + "end "
        "end"
    )
    assert repr(program) == expected


def test_repeat_2_blocks_with_suffix():
    # reference assembly/tests.rs:357-403
    program = assembly.compile("""
    begin
        read read add read eq
        repeat.2
            read
            if.true
                push.3 add mul
            end
            sub inv
        end
    end""")
    unit_head = (
        "read noop noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "if "
        "assert noop noop noop noop noop noop noop "
        "push(3) add mul noop noop noop noop "
        "else "
        "not assert noop noop noop noop noop noop "
        "noop noop noop noop noop noop noop "
        "end "
    )
    expected = (
        "begin "
        "read read add read read::eq eq noop "
        "noop noop noop noop noop noop noop "
        "block "
        + unit_head
        + "neg add inv noop noop noop noop noop "
          "noop noop noop noop noop noop noop noop "
        + unit_head
        + "neg add inv noop noop noop noop noop "
          "noop noop noop noop noop noop noop "
        "end "
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
