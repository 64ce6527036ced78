"""Device-side transition-constraint evaluation.

The polymorphic AIR (decoder_air / stack_air, written as plain ``(a*b) % M``
expressions) is traced over JaxCol device columns and compiled by XLA into
one fused kernel over the whole evaluation domain.  This replaces the native
host sweep for the prover's step 3: the strided LDE slice never leaves the
device (the tunneled host link runs ~15 MB/s, so shipping the (R, n_ev, 4)
trace to the host dominated step-3 time), and the combined transition column
feeds straight into the device iNTT of step 4.

Structured hot spots (op-flag products, MDS, shift checks, the degree-grouped
random linear combination) run through the batched jax_col helpers so the
traced graph stays compact enough for XLA; values are bit-identical to the
scalar/native paths.  Transcript-dependent values (the pseudo-random
constraint coefficients) and the periodic ARK/mask constants enter as traced
arrays so the compiled kernel is reusable across proofs of the same trace
geometry.  Mirrors reference src/stark/prover.rs:39-69 +
constraints/evaluator.rs.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ...math import field
from ...math import field_jax as fj
from ...math.jax_col import JaxCol, stack_cols, unstack, weighted_sum
from ...config import (
    MAX_CONSTRAINT_DEGREE, NUM_CF_OPS, NUM_LD_OPS, NUM_HD_OPS,
)
from ...programs.opcodes import OpCode
from ..trace_state import TraceState
from .evaluator import _ResultView

M = field.M


class _DeviceTraceState(TraceState):
    """TraceState whose lazy op-flag computation runs as stacked device ops.

    Bit-identical to TraceState._compute_flags (including the reference's
    ld_op_flags[2] quirk using cf_op_bits[1] and the PUSH/ASSERT degree
    fix-ups, trace_state.rs:281-350) but with one (k, n, 4) multiply per
    product level instead of one scalar-column multiply per flag."""

    def _compute_flags(self):
        n = self.cf_op_bits[0].arr.shape[0]
        ones = fj.full((1, n), 1)

        def bits_and_nots(bit_cols):
            b = stack_cols(bit_cols, n)
            return b, fj.sub(jnp.broadcast_to(ones, b.shape), b)

        def idx(seq):
            return jnp.asarray(np.array(seq, dtype=np.int32))

        # Binary-split shared subproducts (round 5): each k-bit flag family
        # factors as low-bits x high-bits partial products reused across
        # flags - 48 muls/row for the 32 ld flags instead of the former 128
        # (4 full (32, n, 4) multiply layers).  Bit-identical: the same
        # factors multiply in a different association order, and field
        # multiplication is associative/exact.
        cb, ncb = bits_and_nots(self.cf_op_bits)
        lb, nlb = bits_and_nots(self.ld_op_bits)
        hb, nhb = bits_and_nots(self.hd_op_bits)

        # cf flags: low-2-bit combos (4 muls), then x bit 2 (8 muls)
        cf01 = fj.mul(jnp.stack([ncb[0], cb[0], ncb[0], cb[0]]),
                      jnp.stack([ncb[1], ncb[1], cb[1], cb[1]]))
        cf = fj.mul(cf01[idx([i & 3 for i in range(NUM_CF_OPS)])],
                    jnp.stack([cb[2] if (i >> 2) & 1 else ncb[2]
                               for i in range(NUM_CF_OPS)]))

        # ld flags: low-2-bit combos with the reference quirk - flags whose
        # low two bits are '10' use cf_op_bits[1] as the position-1 factor
        # (trace_state.rs:301); combo index 2 IS that case
        ld01 = fj.mul(jnp.stack([nlb[0], lb[0], nlb[0], lb[0]]),
                      jnp.stack([nlb[1], nlb[1], cb[1], lb[1]]))
        ld23 = fj.mul(jnp.stack([nlb[2], lb[2], nlb[2], lb[2]]),
                      jnp.stack([nlb[3], nlb[3], lb[3], lb[3]]))
        ld234 = fj.mul(ld23[idx([i & 3 for i in range(8)])],
                       jnp.stack([lb[4] if (i >> 2) & 1 else nlb[4]
                                  for i in range(8)]))
        ld = fj.mul(ld01[idx([i & 3 for i in range(NUM_LD_OPS)])],
                    ld234[idx([i >> 2 for i in range(NUM_LD_OPS)])])

        # hd flags: products over the 2 hd bits
        hd = fj.mul(jnp.stack([nhb[0], hb[0], nhb[0], hb[0]]),
                    jnp.stack([nhb[1], nhb[1], hb[1], hb[1]]))[:NUM_HD_OPS]

        begin_flag = JaxCol(fj.mul(ld[OpCode.Begin.ld_index()],
                                   hd[OpCode.Begin.hd_index()]))
        noop_flag = JaxCol(fj.mul(ld[OpCode.Noop.ld_index()],
                                  hd[OpCode.Noop.hd_index()]))

        # degree fix-ups so PUSH/ASSERT flags don't coincide with BEGIN
        hd = hd.at[0].set(fj.mul(hd[0], lb[0]))
        ld = ld.at[0].set(fj.mul(ld[0], hb[0]))

        self._flags = (unstack(cf), unstack(ld), unstack(hd), begin_flag, noop_flag)


def _to_device_state(ctx_depth, loop_depth, stack_depth, columns):
    state = TraceState.from_vec(ctx_depth, loop_depth, stack_depth, columns)
    state.__class__ = _DeviceTraceState
    return state


def _as_col(value, n):
    """Constraint-result slot -> (n, 4) device array (slots never written
    stay Python ints)."""
    if isinstance(value, JaxCol):
        return jnp.broadcast_to(value.arr, (n, 4))
    return fj.full((n,), int(value) % M)


@functools.partial(
    jax.jit, static_argnames=("ctx_depth", "loop_depth", "stack_depth", "groups"))
def _transition_kernel(lde, nxt, dec_ark, dec_masks, stk_ark, cc, xp_series,
                       xp_prefix, excl, n_real, *, ctx_depth, loop_depth,
                       stack_depth, groups):
    """One fused device kernel over a fixed-size chunk of the evaluation
    domain: AIR sweep + degree-grouped random linear combination.

    The chunk shape is geometry-independent (DISTAFF_AIR_CHUNK_ROWS, default
    2^16 rows), so a single XLA compile serves every trace length - this
    matters because compiles run on the far side of the TPU tunnel and this
    kernel is the most expensive compile in the pipeline (~270 s measured).

    lde/nxt: (R, C, 4) current and 8-rows-ahead chunk slices.
    xp_series: (G, C, 4) per-group degree-adjustment power series over one
    chunk (geometry-static, built once and cached - recomputing it in-kernel
    cost ~16 muls/row/group, a measurable slice of the whole AIR sweep).
    xp_prefix: (G, 4) per-chunk scalar xp_base^chunk_offset scaling the
    series to the chunk's offset.
    excl: local index of the final trace step (its wraparound transition is
    legitimately nonzero), or -1 when outside this chunk.
    n_real: rows < n_real are real; the rest are cyclic padding used when the
    whole evaluation domain is smaller than one chunk (small traces reuse the
    big-trace kernel instead of compiling their own).
    Returns (combined column (C, 4), count of real trace-step rows where the
    combined column is nonzero - the debug soundness check)."""
    r_count, n = lde.shape[0], lde.shape[1]
    reps = n // dec_ark.shape[1]

    def tile(rows):
        return [JaxCol(jnp.tile(rows[r], (reps, 1))) for r in range(rows.shape[0])]

    columns = [JaxCol(lde[i]) for i in range(r_count)]
    next_cols = [JaxCol(nxt[i]) for i in range(r_count)]
    current = _to_device_state(ctx_depth, loop_depth, stack_depth, columns)
    next_state = _to_device_state(ctx_depth, loop_depth, stack_depth, next_cols)

    # lazy import to avoid a cycle (evaluator -> decoder_air -> ...); the AIR
    # objects only supply constraint code + counts here - their periodic
    # constants arrive as the traced dec_ark/dec_masks/stk_ark
    from .decoder_air import Decoder as _D
    from .stack_air import Stack as _S

    dec = _D(16, MAX_CONSTRAINT_DEGREE, ctx_depth, loop_depth)
    stk = _S(16, MAX_CONSTRAINT_DEGREE, stack_depth)
    num_decoder = dec.constraint_count()
    t_num = num_decoder + stk.constraint_count()

    evaluations = [0] * t_num
    d = _ResultView(evaluations, 0, num_decoder)
    s = _ResultView(evaluations, num_decoder, t_num)

    dec.evaluate_columns(current, next_state, tile(dec_ark), tile(dec_masks), d)
    stk.evaluate_columns(current, next_state, tile(stk_ark), s)

    # degree-grouped combination (mirrors Evaluator._combine_transition with
    # traced coefficients so the kernel is transcript-independent); each
    # group is two fused weighted sums over its stacked constraint columns
    result = JaxCol(fj.full((n,), 0))
    i = 0
    for gi, constraints in enumerate(groups):
        cols = [JaxCol(_as_col(evaluations[ci], n)) for ci in constraints]
        even = cc[jnp.asarray(
            np.array([2 * (i + k) for k in range(len(constraints))]))]
        odd = cc[jnp.asarray(
            np.array([2 * (i + k) + 1 for k in range(len(constraints))]))]
        i += len(constraints)
        result = (result + weighted_sum(cols, even)) % M
        result_adj = weighted_sum(cols, odd)
        xp = JaxCol(fj.mul(xp_series[gi],
                           jnp.broadcast_to(xp_prefix[gi], (n, 4))))
        result = (result + result_adj * xp) % M

    combined = result.arr
    trace_rows = combined[::MAX_CONSTRAINT_DEGREE]
    idx = jnp.arange(trace_rows.shape[0], dtype=jnp.int32)
    keep = ((idx != excl // MAX_CONSTRAINT_DEGREE)
            & (idx < n_real // MAX_CONSTRAINT_DEGREE))
    bad = jnp.sum(
        (jnp.any(trace_rows != 0, axis=1) & keep).astype(jnp.uint32))
    return combined, bad


def _limb_rows(rows):
    """list of lists of ints -> (k, len, 4) uint32 device array, one upload."""
    arr = np.array(rows, dtype=object)
    limbs = np.stack(
        [((arr >> (32 * k)) & 0xFFFFFFFF).astype(np.uint32) for k in range(4)],
        axis=-1)
    return jnp.asarray(limbs)


# geometry-static device constants, cached across proofs
_CONST_CACHE = {}


def _device_constants(evaluator, chunk):
    n_ev = evaluator.domain_size
    key = (n_ev, chunk,
           evaluator.ctx_depth, evaluator.loop_depth, evaluator.stack_depth)
    cached = _CONST_CACHE.get(key)
    if cached is None:
        from ...ops import tiles

        root_ev = field.get_root_of_unity(n_ev)
        # per-group degree-adjustment power series over ONE chunk: the bases
        # are n_ev-th roots of unity, so the series continues periodically
        # when small domains tile cyclically up to the chunk size
        xp_series = jnp.stack([
            tiles.power_series(field.exp(root_ev, incr), chunk)
            for incr, _ in evaluator.t_degree_groups])
        cached = (
            _limb_rows(evaluator.decoder.ark_rows),
            _limb_rows(evaluator.decoder.mask_rows),
            _limb_rows(evaluator.stack.ark_rows),
            xp_series,
        )
        _CONST_CACHE[key] = cached
    return cached


def evaluate_transition_device(evaluator, trace, debug_check=True):
    """Prover step 3 (transition part) fully on device.

    The domain is swept in fixed-size chunks (DISTAFF_AIR_CHUNK_ROWS rows,
    default 2^16) so the AIR kernel compiles once and serves every trace
    length, and its working set stays bounded at multi-GB domains.  Chunk
    sizes stay aligned to the 128-row periodic-constant cycle (16 steps x 8
    rows/step), so the in-chunk ARK/mask tiling is offset-free.

    Returns the combined transition column over D_ev as an (n_ev, 4) device
    array; bit-identical to the native/columnar host paths."""
    import os

    stride = trace.extension_factor // MAX_CONSTRAINT_DEGREE
    if trace.streaming:
        lde = trace.lde_stride_dev          # built by the stream-commit pass
    else:
        lde = trace.lde_dev[:, ::stride, :]
    n_ev = lde.shape[1]

    chunk_env = os.environ.get("DISTAFF_AIR_CHUNK_ROWS")
    if chunk_env is not None:
        chunk = int(chunk_env)
    else:
        # two canonical chunk sizes: small evaluation domains get an 8x
        # lighter kernel (padding a 2^13-row domain - a 2^10 trace - up to
        # the 2^16 production chunk made the AIR sweep 8x the necessary
        # compute, ~150 ms of the small-proof latency budget); larger
        # domains share the single production executable
        chunk = 1 << 13 if n_ev <= 1 << 15 else 1 << 16
    assert chunk % (16 * MAX_CONSTRAINT_DEGREE) == 0
    if n_ev < chunk:
        assert chunk % n_ev == 0, (
            f"DISTAFF_AIR_CHUNK_ROWS={chunk} must be a multiple of the "
            f"evaluation domain ({n_ev}) when padding small traces")

    dec_ark, dec_masks, stk_ark, xp_series = _device_constants(evaluator, chunk)
    cc = fj.from_ints(np.array(evaluator.coefficients.transition, dtype=object))
    groups = tuple(tuple(cs) for _, cs in evaluator.t_degree_groups)

    # rows 8 ahead with wraparound, so chunks never roll across their edge
    ext = jnp.concatenate(
        [lde[:, MAX_CONSTRAINT_DEGREE:], lde[:, :MAX_CONSTRAINT_DEGREE]], axis=1)

    n_real = n_ev
    if n_ev < chunk:
        # cyclic padding up to one full chunk: small traces reuse the same
        # compiled kernel as large ones (the ARK/mask cycle is 128 rows and
        # n_ev is a multiple of it, so tiling keeps the periodic constants
        # aligned; the xp series wrap identically - their bases are n_ev-th
        # roots of unity); padded rows are sliced off below
        reps = chunk // n_ev
        lde = jnp.tile(lde, (1, reps, 1))
        ext = jnp.tile(ext, (1, reps, 1))
    else:
        assert n_ev % chunk == 0

    root_ev = field.get_root_of_unity(n_ev)
    xp_bases = [field.exp(root_ev, incr) for incr, _ in evaluator.t_degree_groups]
    last_step_row = n_ev - MAX_CONSTRAINT_DEGREE

    parts = []
    bad_total = []
    for lo in range(0, max(n_ev, chunk), chunk):
        xp_prefix = fj.from_ints(np.array(
            [field.exp(b, lo) for b in xp_bases], dtype=object))
        excl = jnp.asarray(
            last_step_row - lo if lo <= last_step_row < lo + chunk else -1,
            dtype=jnp.int32)
        combined, bad = _transition_kernel(
            jax.lax.dynamic_slice_in_dim(lde, lo, chunk, axis=1),
            jax.lax.dynamic_slice_in_dim(ext, lo, chunk, axis=1),
            dec_ark, dec_masks, stk_ark, cc, xp_series,
            xp_prefix, excl, jnp.asarray(min(n_real - lo, chunk), jnp.int32),
            ctx_depth=evaluator.ctx_depth, loop_depth=evaluator.loop_depth,
            stack_depth=evaluator.stack_depth, groups=groups)
        parts.append(combined)
        bad_total.append(bad)

    if debug_check:
        # one device-side reduction + ONE scalar transfer (a per-chunk int()
        # costs a tunnel round trip each)
        total = int(jnp.sum(jnp.stack(bad_total)))
        assert total == 0, (
            f"transition constraints not satisfied at {total} trace steps")
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return out[:n_ev]
