"""Trace table tests (mirrors reference src/stark/trace/trace_table.rs tests):
evaluating the register polynomials at trace-domain points must reproduce the
extended trace states."""

from distaff_tpu import processor
from distaff_tpu.programs import assembly, ProgramInputs
from distaff_tpu.math import field
from distaff_tpu.math import field_jax as fj
from distaff_tpu.stark.trace_table import TraceTable

import numpy as np


def _build_trace():
    program = assembly.compile("begin add push.5 mul push.7 end")
    regs, cd, ld = processor.execute(program, ProgramInputs.from_public([1, 2]))
    trace = TraceTable(regs, cd, ld, 16)
    trace.extend()
    return trace


def test_eval_polys_at_trace_points():
    trace = _build_trace()
    g = field.get_root_of_unity(trace.unextended_length())
    ext = trace.extension_factor

    v1 = trace.eval_polys_at(g)
    s1 = [int(x) for x in fj.to_ints(np.asarray(trace.lde_dev)[:, ext, :])]
    assert v1 == s1

    v2 = trace.eval_polys_at(field.exp(g, 2))
    s2 = [int(x) for x in fj.to_ints(np.asarray(trace.lde_dev)[:, 2 * ext, :])]
    assert v2 == s2


def test_lde_agrees_with_unextended_trace():
    trace = _build_trace()
    ext = trace.extension_factor
    arr = np.asarray(trace.lde_dev)
    for step in [0, 1, 7, trace.unextended_length() - 1]:
        row = [int(x) for x in fj.to_ints(arr[:, step * ext, :])]
        assert row == [r[step] for r in trace.registers]


def test_last_state_position():
    trace = _build_trace()
    last = trace.get_last_state()
    assert last.op_counter == trace.registers[0][-1]


def test_extend_register_chunking(monkeypatch):
    # a tiny HBM budget forces the chunked NTT path; the LDE must be
    # identical to the single-dispatch result
    import numpy as np
    from distaff_tpu import processor, ProgramInputs, assembly
    from distaff_tpu.stark.trace_table import TraceTable

    program = assembly.compile("begin push.3 push.5 add dup mul end")
    regs, cd, ld = processor.execute(program, ProgramInputs.none())

    t1 = TraceTable(regs, cd, ld, 16)
    t1.extend()
    monkeypatch.setenv("DISTAFF_NTT_BUDGET_BYTES", str(1 << 20))
    t2 = TraceTable(regs, cd, ld, 16)
    t2.extend()
    assert np.array_equal(np.asarray(t1.lde_dev), np.asarray(t2.lde_dev))
