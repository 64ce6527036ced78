"""AIR constraint tests: valid traces satisfy the transition constraints
(the analogue of the reference's per-family constraint tests plus its
debug-build zero-check harness, reference constraints/evaluator.rs:152-158).
"""

import numpy as np
import pytest

from distaff_tpu import processor
from distaff_tpu.programs import assembly, ProgramInputs
from distaff_tpu.stark.trace_table import TraceTable
from distaff_tpu.stark.constraints.evaluator import Evaluator
from distaff_tpu.stark import prover

# module default is the CORE tier (the AIR vanishing/corruption oracles are
# the protocol's soundness harness); only the device-kernel parity test
# below is heavy (its op-by-op disable_jit sweep takes ~4 min on CPU)


PROGRAMS = [
    # exercises add/mul/push + block nesting
    ("begin add block push.5 mul push.7 end end", ProgramInputs.from_public([1, 2])),
    # exercises switch + eq/choose ops
    ("begin read if.true add push.3 else push.7 add push.8 end mul end",
     ProgramInputs([5, 3], [0], [])),
    # exercises loop wrap/break
    ("begin mul read while.true dup mul read end end", ProgramInputs([5, 3], [1, 1, 0], [])),
    # exercises cmp chains
    ("begin push.5 push.3 gt.8 end", ProgramInputs.none()),
    # exercises rescr rounds
    ("begin push.3 push.5 hash.2 end", ProgramInputs.none()),
    # exercises binacc
    ("begin read rc.16 end", ProgramInputs([], [42], [])),
]


@pytest.mark.parametrize("src,inputs", PROGRAMS)
def test_transition_constraints_vanish_on_trace(src, inputs):
    program = assembly.compile(src)
    regs, ctx_depth, loop_depth = processor.execute(program, inputs)
    trace = TraceTable(regs, ctx_depth, loop_depth, 16)
    trace.extend()

    outputs = trace.get_last_state().user_stack[:1]
    evaluator = Evaluator.from_trace(
        trace, b"\x11" * 32, inputs.get_public_inputs(), outputs)

    # the columnar evaluator asserts that the combined transition constraint
    # column is zero at every unextended trace step (except the last)
    prover._evaluate_constraints_columnar(evaluator, trace, debug_check=True)


def test_corrupted_trace_breaks_constraints():
    program = assembly.compile("begin push.3 push.5 add end")
    regs, ctx_depth, loop_depth = processor.execute(program, ProgramInputs.none())
    # corrupt one user-stack value mid-trace
    regs[16][7] = (regs[16][7] + 1) % (2**100)
    trace = TraceTable(regs, ctx_depth, loop_depth, 16)
    trace.extend()
    evaluator = Evaluator.from_trace(trace, b"\x11" * 32, [], [8])
    with pytest.raises(AssertionError):
        prover._evaluate_constraints_columnar(evaluator, trace, debug_check=True)


# ------------------------------------------------------------------------------------------------
# batched device-column helpers (jax_col): equivalence with scalar field math
# ------------------------------------------------------------------------------------------------

def test_jax_col_batched_helpers_match_scalar():
    import os
    from distaff_tpu.math import field
    from distaff_tpu.math import field_jax as fj
    from distaff_tpu.math.jax_col import (
        JaxCol, mul_flag, pow3_all, mds_apply, weighted_sum)
    from distaff_tpu.crypto.ark_constants import SPONGE_MDS

    M = field.M
    rng = np.random.default_rng(7)
    n = 16

    def rand_col():
        vals = [int.from_bytes(rng.bytes(16), "little") % M for _ in range(n)]
        return vals, JaxCol(fj.from_ints(np.array(vals, dtype=object)))

    flag_vals, flag = rand_col()
    cols = [rand_col() for _ in range(4)]

    # mul_flag == per-column flag * value
    prods = mul_flag(flag, [c for _, c in cols])
    for (vals, _), p in zip(cols, prods):
        expected = [(f * v) % M for f, v in zip(flag_vals, vals)]
        assert list(fj.to_ints(np.asarray(p.arr))) == expected

    # pow3_all == v^3
    cubes = pow3_all([c for _, c in cols])
    for (vals, _), p in zip(cols, cubes):
        assert list(fj.to_ints(np.asarray(p.arr))) == [pow(v, 3, M) for v in vals]

    # mds_apply == row-by-row MDS multiply
    state = [c for _, c in cols]
    out = mds_apply(state, SPONGE_MDS, 4)
    for i in range(4):
        expected = [
            sum(SPONGE_MDS[i * 4 + j] * cols[j][0][k] for j in range(4)) % M
            for k in range(n)
        ]
        assert list(fj.to_ints(np.asarray(out[i].arr))) == expected

    # weighted_sum == sum_i w_i * v_i
    weights = [int.from_bytes(rng.bytes(16), "little") % M for _ in range(4)]
    w_dev = fj.from_ints(np.array(weights, dtype=object))
    ws = weighted_sum(state, w_dev)
    expected = [
        sum(weights[i] * cols[i][0][k] for i in range(4)) % M for k in range(n)
    ]
    assert list(fj.to_ints(np.asarray(ws.arr))) == expected


def test_jax_col_int_coercion_and_mod():
    from distaff_tpu.math import field
    from distaff_tpu.math import field_jax as fj
    from distaff_tpu.math.jax_col import JaxCol

    M = field.M
    vals = [3, M - 1, 12345]
    col = JaxCol(fj.from_ints(np.array(vals, dtype=object)))
    r = (1 - col) % M                       # __rsub__ + __mod__
    assert list(fj.to_ints(np.asarray(r.arr))) == [(1 - v) % M for v in vals]
    r = (col + 5) % M
    assert list(fj.to_ints(np.asarray(r.arr))) == [(v + 5) % M for v in vals]
    r = (7 * col) % M
    assert list(fj.to_ints(np.asarray(r.arr))) == [(7 * v) % M for v in vals]


@pytest.mark.heavy
@pytest.mark.parametrize("src,inputs", PROGRAMS[:1])
def test_device_transition_matches_host(src, inputs):
    """The device AIR path (device_eval._transition_kernel - the kernel that
    actually runs on TPU) must produce the exact combined transition column
    of the host evaluator.

    By default the kernel body runs op-by-op under jax.disable_jit(): the
    identical math on the identical arrays, without the fused-kernel XLA
    compile, which on CPU XLA is pathologically slow (>10 min even with
    backend optimizations off).  Set DISTAFF_TEST_DEVICE_AIR=1 (ideally on
    TPU, where bench.py also exercises it end-to-end) to run the real
    compiled kernel instead."""
    import contextlib
    import os

    import jax

    from distaff_tpu.math import field_jax as fj
    from distaff_tpu.stark.constraints.device_eval import evaluate_transition_device

    program = assembly.compile(src)
    regs, ctx_depth, loop_depth = processor.execute(program, inputs)
    trace = TraceTable(regs, ctx_depth, loop_depth, 16)
    trace.extend()
    outputs = trace.get_last_state().user_stack[:1]
    evaluator = Evaluator.from_trace(
        trace, b"\x11" * 32, inputs.get_public_inputs(), outputs)

    compiled = os.environ.get("DISTAFF_TEST_DEVICE_AIR")
    ctx = contextlib.nullcontext() if compiled else jax.disable_jit()
    with ctx:
        t_dev = np.asarray(evaluate_transition_device(evaluator, trace))

    import os
    os.environ["DISTAFF_DEVICE_AIR"] = "0"
    try:
        _, _, t_host = prover._evaluate_constraints_columnar(
            evaluator, trace, debug_check=False)
    finally:
        del os.environ["DISTAFF_DEVICE_AIR"]
    if not (isinstance(t_host, np.ndarray) and t_host.dtype == np.uint32):
        t_host = np.asarray(fj.from_ints(np.asarray(t_host, dtype=object)))
    assert (t_dev == t_host).all()
