"""STARK prover: the 9-step pipeline (reference src/stark/prover.rs and
src/stark/README.md), re-architected for the TPU:

1. trace LDE           - device NTT per register
2. trace Merkle tree   - batched leaf hashing of device rows
3. constraint eval     - columnar sweep over the whole evaluation domain
                         (replaces the reference's per-step scalar loop)
4. constraint poly     - device iNTT + vectorized synthetic divisions
5. constraint commit   - device NTT over the LDE domain + batched hashing
6. DEEP composition    - computed pointwise in the evaluation domain with
                         batched inversions (identical field values to the
                         reference's coefficient-space construction, but no
                         sequential synthetic division on the hot path)
7. FRI                 - device radix-4 folds + host Merkle commitments
8. PoW + queries       - batched grinding, StdRng-compatible sampling
9. proof assembly      - host
"""

import functools
import logging
import os
import time

import numpy as np
import jax.numpy as jnp

from ..math import field
from ..math import field_jax as fj
from ..config import MAX_CONSTRAINT_DEGREE
from ..crypto.merkle import MerkleTree
from ..crypto import hashes
from .trace_state import TraceState
from .constraints.evaluator import Evaluator
from . import utils, fri
from .proof import StarkProof, DeepValues

log = logging.getLogger(__name__)
M = field.M


def prove(trace, inputs, outputs, options):
    # 1 ----- extend execution trace -------------------------------------------------------------
    now = time.time()
    trace.extend()
    domain_size = trace.domain_size()
    lde_root = field.get_root_of_unity(domain_size)
    log.debug("Extended execution trace from %d to %d steps in %.0f ms",
              trace.unextended_length(), domain_size, (time.time() - now) * 1000)

    # 2 ----- commit to the extended trace -------------------------------------------------------
    now = time.time()
    trace_tree = trace.build_merkle_tree(options.hash_fn)
    log.debug("Built trace Merkle tree in %.0f ms", (time.time() - now) * 1000)

    # 3 ----- evaluate constraints over the evaluation domain ------------------------------------
    now = time.time()
    evaluator = Evaluator.from_trace(trace, trace_tree.root(), inputs, outputs)
    i_evals, f_evals, t_evals = _evaluate_constraints_columnar(evaluator, trace)
    if os.environ.get("DISTAFF_DEBUG", "0") != "0":
        _validate_transition_degrees(evaluator, trace)
    log.debug("Evaluated %d constraints over domain of %d elements in %.0f ms",
              evaluator.constraint_count(), evaluator.domain_size, (time.time() - now) * 1000)

    # 4 ----- combine into the constraint polynomial ---------------------------------------------
    now = time.time()
    constraint_poly = _combine_constraint_polys(
        evaluator, i_evals, f_evals, t_evals, trace.unextended_length())
    del i_evals, f_evals, t_evals
    if trace.streaming:
        # the D_ev stride slice (multi-GB at 2^20) has no consumers past
        # step 4; free it before the constraint LDE + FRI working sets land
        trace.lde_stride_dev = None
    log.debug("Combined constraint evaluations into a polynomial in %.0f ms",
              (time.time() - now) * 1000)

    # 5 ----- commit to constraint polynomial evaluations ----------------------------------------
    now = time.time()
    padded = jnp.zeros((domain_size, 4), dtype=jnp.uint32)
    padded = padded.at[: constraint_poly.shape[0]].set(constraint_poly)
    # the single biggest transform of the proof (2^25 rows at the 2^20 north
    # star): intra-NTT sharded over the mesh when one is configured
    constraint_lde = _extend_column_dev(padded, lde_root, "constraint_lde")
    constraint_tree = _build_constraint_tree(constraint_lde, options.hash_fn)
    log.debug("Evaluated constraint polynomial and built constraint tree in %.0f ms",
              (time.time() - now) * 1000)

    # 6 ----- DEEP composition -------------------------------------------------------------------
    now = time.time()
    seed = constraint_tree.root()
    z = utils.draw_z(seed)
    cc = utils.CompositionCoefficients(seed)
    composed, deep_values = _build_composition_evaluations(
        trace, constraint_poly, constraint_lde, z, cc)
    log.debug("Built composition evaluations over %d elements in %.0f ms",
              domain_size, (time.time() - now) * 1000)

    # 7 ----- FRI --------------------------------------------------------------------------------
    now = time.time()
    fri_trees, fri_values = fri.reduce(composed, lde_root, options)
    log.debug("Computed %d FRI layers in %.0f ms", len(fri_trees), (time.time() - now) * 1000)

    # 8 ----- proof of work + query positions ----------------------------------------------------
    now = time.time()
    fri_roots = b"".join(tree.root() for tree in fri_trees)
    hash_fn = hashes.HASH_FUNCTIONS[options.hash_fn]
    seed = hash_fn(fri_roots)
    seed, pow_nonce = utils.find_pow_nonce(seed, options)
    positions = utils.compute_query_positions(seed, domain_size, options)
    log.debug("Determined %d query positions in %.0f ms",
              len(positions), (time.time() - now) * 1000)

    # 9 ----- proof object -----------------------------------------------------------------------
    now = time.time()
    # enqueue the trace/constraint tree openings FIRST so their transfers
    # overlap the FRI layer gathers below
    from ..ops.hostsync import TransferBatch

    batch = TransferBatch()  # one bulk device->host fetch for all of step 9
    constraint_positions = utils.map_trace_to_constraint_positions(positions)
    trace_opening = trace_tree.prove_batch_async(positions, batch=batch)
    constraint_opening = constraint_tree.prove_batch_async(
        constraint_positions, batch=batch)
    t_enq = time.time()
    trace_eval_pending = trace.get_register_values_at_async(positions, batch)
    t_evals_enq = time.time()
    fri_proof = fri.build_proof(fri_trees, fri_values, positions, batch)
    t_fri = time.time()
    trace_evaluations = trace_eval_pending()
    log.debug("step 9: openings enqueue %.0f ms, eval enqueue %.0f ms, "
              "fri proof %.0f ms, eval fetch %.0f ms",
              (t_enq - now) * 1000, (t_evals_enq - t_enq) * 1000,
              (t_fri - t_evals_enq) * 1000, (time.time() - t_fri) * 1000)

    proof = StarkProof(
        trace_tree.root(),
        trace_opening.result(),
        trace_evaluations,
        constraint_tree.root(),
        constraint_opening.result(),
        deep_values,
        fri_proof,
        pow_nonce,
        trace.get_last_state().op_counter,
        trace.ctx_depth,
        trace.loop_depth,
        trace.stack_depth,
        options,
    )
    log.debug("Built proof object in %.0f ms", (time.time() - now) * 1000)
    return proof


# ------------------------------------------------------------------------------------------------
# step 3: columnar constraint evaluation
# ------------------------------------------------------------------------------------------------

def _evaluate_constraints_columnar(evaluator, trace, debug_check=None):
    from .. import native

    if debug_check is None:
        # the transition-satisfaction self-check mirrors the reference's
        # debug_assert! sweep (evaluator.rs:108-116): a debug aid, skipped
        # in release - it costs a device reduction + a blocking fetch on
        # the hot path, and prover correctness is established by verify()
        debug_check = os.environ.get("DISTAFF_DEBUG", "0") != "0"

    stride = trace.extension_factor // MAX_CONSTRAINT_DEGREE
    n_ev = evaluator.domain_size

    # multi-chip: row-sharded boundary + transition sweeps over the mesh.
    # The transition kernel shares its AIR trace with the single-device path
    # (parallel/mesh_stages.py); mesh selection implies per-geometry compiles,
    # the normal trade for production multi-chip shapes.
    from ..parallel.mesh import configured_mesh
    mesh = configured_mesh()
    lde_any = trace.lde_dev if trace.lde_dev is not None else trace.polys_dev
    on_accelerator = any(d.platform != "cpu" for d in lde_any.devices())
    if mesh is not None and n_ev % mesh.devices.size == 0:
        from ..parallel import mesh_stages

        i_evals, f_evals = mesh_stages.boundaries_sharded(
            evaluator, trace, stride, mesh)
        # the fused AIR kernel compiles pathologically slowly on CPU XLA, so
        # "auto" shards it only on real accelerators and keeps the native
        # host sweep on (virtual) CPU meshes; DISTAFF_MESH_AIR=1 forces the
        # sharded kernel anywhere (the CPU mesh test runs it under
        # jax.disable_jit instead)
        mesh_air = os.environ.get("DISTAFF_MESH_AIR", "auto")
        use_mesh_air = mesh_air == "1" or (
            mesh_air == "auto" and on_accelerator) or not native.available()
        if use_mesh_air or jax_disable_jit_active():
            t_evals = mesh_stages.transition_sharded(
                evaluator, trace, mesh, debug_check)
        else:
            t_evals = _native_transition_column(
                evaluator, trace, stride, debug_check)
        return i_evals, f_evals, t_evals

    # default path for large domains: the whole step stays on device -
    # transition constraints as one fused XLA kernel over the domain,
    # boundary columns as weighted register sums; nothing crosses the host
    # link.  Small domains keep the native sweep: their transfers are cheap
    # and the AIR kernel's one-time XLA compile per trace geometry isn't
    # worth paying for unit-test-sized traces.
    min_domain = int(os.environ.get("DISTAFF_DEVICE_AIR_MIN_DOMAIN", 1 << 13))
    air_mode = os.environ.get("DISTAFF_DEVICE_AIR", "auto")
    # "auto": device kernel on real accelerators for large domains.  CPU XLA
    # compiles this kernel pathologically slowly (>10 min), so auto never
    # picks it there; "1" forces it regardless of backend.
    use_device_air = air_mode == "1" or trace.streaming or (
        air_mode == "auto" and on_accelerator
        and (n_ev >= min_domain or min_domain == 0))
    if use_device_air:
        from .constraints.device_eval import evaluate_transition_device

        i_evals, f_evals = _evaluate_boundaries_device(evaluator, trace, stride)
        t_evals = evaluate_transition_device(evaluator, trace, debug_check)
        return i_evals, f_evals, t_evals

    # transition constraints: native columnar sweep when available; boundary
    # columns become two fused weighted register sums on device
    if native.available():
        i_evals, f_evals = _evaluate_boundaries_device(evaluator, trace, stride)
        t_u32 = _native_transition_column(evaluator, trace, stride, debug_check)
        return i_evals, f_evals, t_u32

    # stride-slice on device so only n_ev rows cross the link, not the
    # full LDE domain
    trace_u32 = np.ascontiguousarray(np.asarray(trace.lde_dev[:, ::stride, :]))

    # fallback path: host object columns through the polymorphic AIR
    P_u32 = np.asarray(fj.power_series(field.get_root_of_unity(n_ev), n_ev))
    j = np.arange(n_ev, dtype=np.uint64)

    def xp_indices(p):
        return ((j * np.uint64(p % n_ev)) % np.uint64(n_ev)).astype(np.int64)

    obj = trace_u32.astype(object)
    columns = [
        obj[i, :, 0] | (obj[i, :, 1] << 32) | (obj[i, :, 2] << 64) | (obj[i, :, 3] << 96)
        for i in range(trace_u32.shape[0])
    ]
    current = TraceState.from_vec(
        trace.ctx_depth, trace.loop_depth, trace.stack_depth, columns)
    P_obj = fj.to_ints(P_u32)
    xp_b = P_obj[xp_indices(evaluator.b_degree_adj)]
    i_evals, f_evals = evaluator.evaluate_boundaries(current, xp_b)

    next_cols = [np.roll(c, -MAX_CONSTRAINT_DEGREE) for c in columns]
    next_state = TraceState.from_vec(
        trace.ctx_depth, trace.loop_depth, trace.stack_depth, next_cols)
    t_evals = evaluator.evaluate_transition_columns(
        current, next_state, lambda p: P_obj[xp_indices(p)])

    if debug_check:
        zeros = t_evals[:: MAX_CONSTRAINT_DEGREE][:-1]
        bad = np.nonzero(zeros)[0]
        assert len(bad) == 0, f"transition constraints not satisfied at step {bad[:3]}"

    return i_evals, f_evals, t_evals


def _mesh_for_transform(n):
    """The configured mesh, if the size-n four-step split divides it and
    sharded transforms are enabled.

    DISTAFF_MESH_NTT: "auto" (default) shards column transforms on real
    accelerator meshes only - the virtual CPU mesh pays minutes of CPU-XLA
    compile per sharded-NTT graph, so tests that validate this path force
    "1" explicitly; "0" disables."""
    from ..parallel.mesh import configured_mesh

    mesh = configured_mesh()
    if mesh is None:
        return None
    mode = os.environ.get("DISTAFF_MESH_NTT", "auto")
    if mode == "0":
        return None
    if mode != "1" and all(d.platform == "cpu" for d in mesh.devices.flat):
        return None
    n1 = 1 << ((n.bit_length() - 1) // 2)
    return mesh if n1 % mesh.devices.size == 0 else None


def _extend_column_dev(padded, root_int, stage):
    """Full-domain NTT of one (n, 4) column.

    Under a configured mesh the transform itself is sharded - the four-step
    decomposition with an all-to-all between the row and column passes
    (parallel/ntt_sharded.py, the TPU re-architecture of the reference's
    fork-join FFT, src/math/fft.rs:29-38); single-device runs use the
    fixed-tile Bailey recursion."""
    from ..ops import tiles

    mesh = _mesh_for_transform(padded.shape[0])
    if mesh is not None:
        from ..parallel import ntt_sharded as ns
        from ..parallel import mesh_stages

        out = ns.ntt_sharded(padded, mesh, root_int)
        # record the transform's matrix sharding (the final reshape to
        # (n, 4) re-replicates eagerly)
        mesh_stages.RECORDED_SHARDINGS[stage] = ns.LAST_SHARDING
        return out
    return tiles.ntt(padded, root_int)


def _validate_transition_degrees(evaluator, trace):
    """Debug-mode per-constraint degree validation (reference
    src/stark/constraints/constraint_table.rs:90-112, evaluator.rs:360-380):
    evaluate every transition constraint individually over D_ev, interpolate
    each column, and assert its actual degree does not exceed the declared
    degree x (trace_length - 1).  A mis-declared degree breaks the soundness
    accounting (the degree-adjustment groups), so this is the de-facto AIR
    soundness harness."""
    from ..math import polynom

    stride = trace.extension_factor // MAX_CONSTRAINT_DEGREE
    if trace.streaming:
        trace_u32 = np.ascontiguousarray(np.asarray(trace.lde_stride_dev))
    else:
        trace_u32 = np.ascontiguousarray(np.asarray(trace.lde_dev[:, ::stride, :]))

    obj = trace_u32.astype(object)
    columns = [
        obj[i, :, 0] | (obj[i, :, 1] << 32) | (obj[i, :, 2] << 64) | (obj[i, :, 3] << 96)
        for i in range(trace_u32.shape[0])
    ]
    current = TraceState.from_vec(
        trace.ctx_depth, trace.loop_depth, trace.stack_depth, columns)
    next_cols = [np.roll(c, -MAX_CONSTRAINT_DEGREE) for c in columns]
    next_state = TraceState.from_vec(
        trace.ctx_depth, trace.loop_depth, trace.stack_depth, next_cols)

    evaluations = evaluator.evaluate_transition_individual(current, next_state)
    declared = evaluator.transition_degrees()
    trace_degree = evaluator.trace_length - 1
    n_ev = evaluator.domain_size
    actual = []
    for col in evaluations:
        if isinstance(col, int):
            col = np.full(n_ev, col, dtype=object)
        actual.append(polynom.infer_degree([int(v) for v in col]))
    bad = [(i, declared[i] * trace_degree, actual[i])
           for i in range(len(declared)) if actual[i] > declared[i] * trace_degree]
    assert not bad, (
        "constraint degrees didn't match (constraint, expected_max, actual): "
        f"{bad[:5]}")


def jax_disable_jit_active():
    import jax

    return bool(jax.config.jax_disable_jit)


def _native_transition_column(evaluator, trace, stride, debug_check):
    """Native C++ columnar transition sweep over D_ev (host-side): the
    stride slice crosses the link once, xp power series come from device
    tiles, and the combined column returns as (n_ev, 4) uint32."""
    from .. import native
    from ..ops import tiles

    n_ev = evaluator.domain_size
    if trace.streaming:
        trace_u32 = np.ascontiguousarray(np.asarray(trace.lde_stride_dev))
    else:
        trace_u32 = np.ascontiguousarray(np.asarray(trace.lde_dev[:, ::stride, :]))
    root_ev = field.get_root_of_unity(n_ev)
    xp_u32 = np.stack([
        np.asarray(tiles.power_series(field.exp(root_ev, incr), n_ev))
        for incr, _ in evaluator.t_degree_groups])
    t_u32 = native.eval_transition(
        trace_u32, trace.ctx_depth, trace.loop_depth, trace.stack_depth,
        evaluator.decoder.ark_rows, evaluator.decoder.mask_rows,
        evaluator.stack.ark_rows,
        evaluator.coefficients.transition, evaluator.t_degree_groups, xp_u32)
    if debug_check:
        zeros = t_u32[:: MAX_CONSTRAINT_DEGREE][:-1]
        bad = np.nonzero(zeros.any(axis=1))[0]
        assert len(bad) == 0, f"transition constraints not satisfied at step {bad[:3]}"
    return t_u32


def _evaluate_boundaries_device(evaluator, trace, stride):
    """Boundary constraint columns over D_ev computed on device.

    The combined first/last-step boundary columns are weighted register sums
    plus transcript constants (evaluator.boundary_weight_vectors), so each is
    two fused (R, n_ev, 4) x (R, 4) reductions and one multiply by the
    x^b_degree_adj power series - bit-identical to the reference's per-step
    loop (evaluator.rs:181-326) without any host big-int work.
    """
    from ..ops import tiles

    n_ev = evaluator.domain_size
    if trace.streaming:
        lde = trace.lde_stride_dev                           # (R, n_ev, 4)
    else:
        lde = trace.lde_dev[:, ::stride, :]                  # (R, n_ev, 4)
    r_ev = field.get_root_of_unity(n_ev)
    xp = tiles.power_series(field.exp(r_ev, evaluator.b_degree_adj), n_ev)

    i_parts, f_parts = evaluator.boundary_weight_vectors(lde.shape[0])

    def combine(parts):
        w1, w2, c1, c2 = parts
        s1 = tiles.weighted_register_sum(lde, fj.from_ints(np.array(w1, dtype=object)))
        s2 = tiles.weighted_register_sum(lde, fj.from_ints(np.array(w2, dtype=object)))
        base = fj.add(s1, jnp.broadcast_to(fj.constant(c1), (n_ev, 4)))
        adj = fj.add(s2, jnp.broadcast_to(fj.constant(c2), (n_ev, 4)))
        return fj.add(base, fj.mul(xp, adj))

    return combine(i_parts), combine(f_parts)


# ------------------------------------------------------------------------------------------------
# step 4: combine boundary/transition polynomials with their divisors
# ------------------------------------------------------------------------------------------------

def _syn_div_column(coeffs_obj, b):
    """Divide the polynomial (object-array coefficients) by (x - b).

    T_i = sum_{j >= i} a_j b^{j-i}; result[i] = T_{i+1}, computed with a
    power-weighted suffix sum instead of the reference's sequential scan."""
    n = len(coeffs_obj)
    if b == 1:
        w = coeffs_obj
    else:
        pb = _object_powers(b, n)
        w = (coeffs_obj * pb) % M
    suffix = np.concatenate([np.cumsum(w[::-1])[::-1][1:], [0]]) % M
    if b == 1:
        return suffix
    b_inv = field.inv(b)
    pbinv = _object_powers(b_inv, n) * b_inv
    return (suffix * pbinv) % M


def _syn_div_expanded_column(coeffs_obj, degree, exception):
    """Divide by (x^degree - 1) / (x - exception), vectorized."""
    n = len(coeffs_obj)
    m = n // degree
    # q = a / (x^degree - 1): suffix sums along the stride-degree axis
    B = coeffs_obj.reshape(m, degree)
    R = np.cumsum(B[::-1], axis=0)[::-1] % M
    r = R.reshape(n)
    # multiply by (x - exception)
    e_neg = field.neg(exception)
    r_ext = np.concatenate([r, [0]])
    r_shift = np.concatenate([[0], r])
    prod = (r_ext * e_neg + r_shift) % M
    count = (n - degree) + 1
    out = np.zeros(n, dtype=object)
    out[:count] = prod[degree : degree + count]
    return out


def _object_powers(b, n):
    """[b^0 .. b^(n-1)] as an object array via log-doubling."""
    idx = np.arange(n, dtype=np.uint64)
    result = np.ones(n, dtype=object)
    p = b
    k = 0
    while (1 << k) < n:
        use = (idx >> np.uint64(k)) & np.uint64(1) == 1
        result[use] = (result[use] * p) % M
        p = (p * p) % M
        k += 1
    return result


def _incl_suffix_sums(w, axis=0):
    """s_i = sum_{j >= i} w_j along an axis (device, log-depth scan).

    Only used for SHORT scan axes (the stride-`degree` divisor's length-8
    axis); full-domain suffix sums go through tiles.suffix_sums, whose
    fixed-tile kernels are shared by every trace geometry."""
    return jnp.flip(fj.cumsum(jnp.flip(w, axis=axis), axis=axis), axis=axis)


def _syn_div_dev(poly, b):
    """Device division of a polynomial by (x - b), b a root-of-unity power.

    Same power-weighted suffix-sum reformulation as _syn_div_column:
    T_i = b^{-i} * sum_{j >= i} a_j b^j and result[i] = T_{i+1}.  The b and
    1/b power series ride the fixed-tile builders (host-int bases)."""
    from ..ops import tiles

    n = poly.shape[0]
    zero = jnp.zeros((1, 4), dtype=jnp.uint32)
    if b == 1:
        s = tiles.suffix_sums(poly)
        return jnp.concatenate([s[1:], zero])
    w = fj.mul(poly, tiles.power_series(b, n))
    s = tiles.suffix_sums(w)
    s_next = jnp.concatenate([s[1:], zero])                  # s_{i+1}
    b_inv = field.inv(b)
    pbinv = tiles.scale(tiles.power_series(b_inv, n), b_inv)  # b^{-(i+1)}
    return fj.mul(s_next, pbinv)


def _syn_div_expanded_dev(poly, degree, exception):
    """Device division by (x^degree - 1) / (x - exception).

    Quotient by (x^degree - 1) is a stride-`degree` suffix sum; the
    (x - exception) numerator factor is restored with one shifted
    multiply-add (mirrors _syn_div_expanded_column)."""
    n = poly.shape[0]
    m = n // degree
    r = _incl_suffix_sums(poly.reshape(m, degree, 4)).reshape(n, 4)
    zero = jnp.zeros((1, 4), dtype=jnp.uint32)
    r_ext = jnp.concatenate([r, zero])                       # length n+1
    r_shift = jnp.concatenate([zero, r])
    neg_e = fj.constant(field.neg(exception))
    prod = fj.add(fj.mul(r_ext, jnp.broadcast_to(neg_e, (n + 1, 4))), r_shift)
    count = n - degree + 1
    out = jnp.zeros((n, 4), dtype=jnp.uint32)
    return out.at[:count].set(prod[degree : degree + count])


def _combine_constraint_polys(evaluator, i_evals, f_evals, t_evals, trace_length):
    """iNTT each combined column, divide by its zero-polynomial, and sum -
    all on device.  Returns the constraint polynomial as (n_ev, 4) limbs."""
    n_ev = evaluator.domain_size
    ev_root = field.get_root_of_unity(n_ev)

    def _to_limbs(evals):
        if isinstance(evals, jnp.ndarray) and not isinstance(evals, np.ndarray):
            return evals                       # already on device
        if isinstance(evals, np.ndarray) and evals.dtype == np.uint32:
            return jnp.asarray(evals)
        return fj.from_ints(np.asarray(evals, dtype=object))

    from ..ops import tiles
    mesh = _mesh_for_transform(n_ev)
    if mesh is not None:
        # mesh proving: the three D_ev-sized interpolations run as sharded
        # four-step transforms (one all-to-all each)
        from ..parallel import ntt_sharded as ns
        from ..parallel import mesh_stages

        i_poly = ns.intt_sharded(_to_limbs(i_evals), mesh, ev_root)
        f_poly = ns.intt_sharded(_to_limbs(f_evals), mesh, ev_root)
        t_poly = ns.intt_sharded(_to_limbs(t_evals), mesh, ev_root)
        # record the transform's matrix sharding (the final reshape to
        # (n, 4) re-replicates eagerly)
        mesh_stages.RECORDED_SHARDINGS["constraint_intt"] = ns.LAST_SHARDING
    elif evaluator.domain_size >= (1 << 23):
        # huge domains: three separate iNTTs with a fence between them -
        # the async eager NTT chain holds ~10 full-size intermediates, and
        # batching all three columns at 2^23+ rows triples that peak
        def _intt_fenced(evals):
            out = tiles.intt(_to_limbs(evals), ev_root)
            np.asarray(out[:1])
            return out

        i_poly = _intt_fenced(i_evals)
        f_poly = _intt_fenced(f_evals)
        t_poly = _intt_fenced(t_evals)
    else:
        stacked = jnp.stack(
            [_to_limbs(i_evals), _to_limbs(f_evals), _to_limbs(t_evals)], axis=0)
        polys3 = tiles.intt_batched(stacked, ev_root)        # one batched iNTT
        i_poly, f_poly, t_poly = polys3[0], polys3[1], polys3[2]

    x_last = evaluator.get_x_at_last_step()
    i_div = _syn_div_dev(i_poly, 1)
    f_div = _syn_div_dev(f_poly, x_last)
    t_div = _syn_div_expanded_dev(t_poly, trace_length, x_last)

    combined_dev = fj.add(fj.add(i_div, f_div), t_div)

    if os.environ.get("DISTAFF_DEBUG", "0") != "0":
        combined = fj.to_ints(np.asarray(combined_dev))
        # debug-mode degree validation (reference constraint_poly.rs:13-26,
        # constraint_table.rs:90-112): after dividing out the zero
        # polynomials, the combined constraint polynomial must have degree
        # exactly |D_ev| - |D_trace| = 7n, i.e. every higher coefficient of
        # the length-8n coefficient vector must vanish.
        expected = n_ev - trace_length
        high = np.nonzero(combined[expected + 1:])[0]
        assert len(high) == 0, (
            f"constraint polynomial degree exceeds {expected}: nonzero "
            f"coefficients at {expected + 1 + high[:3]}")
        assert combined[expected] != 0, (
            f"constraint polynomial degree is below the expected {expected}")

    return combined_dev


# ------------------------------------------------------------------------------------------------
# step 5: constraint commitment
# ------------------------------------------------------------------------------------------------

def _build_constraint_tree(constraint_lde, hash_name):
    """Two evaluations (32 raw bytes) per leaf - unlike the trace tree, the
    leaves are the evaluation bytes themselves (reference prover.rs:84-86)."""
    if hash_name == "blake3" and os.environ.get("DISTAFF_DEVICE_HASH", "1") != "0":
        from ..crypto.merkle_dev import make_device_tree
        # (D, 4) -> (D/2, 8) leaves: the direct reshape is lowered as a copy
        # into a T(8,128)-padded layout (32x HBM) - catastrophic at
        # 2^25-element domains, but a sub-ms copy for small domains where
        # the 8-slice stack's eager dispatches dominate instead
        d = constraint_lde.shape[0]
        if d <= 1 << 17:
            leaves = constraint_lde.reshape(d // 2, 8)
        else:
            leaves = jnp.stack(
                [constraint_lde[0::2, l] for l in range(4)]
                + [constraint_lde[1::2, l] for l in range(4)], axis=1)
        return make_device_tree(leaves)
    arr = np.ascontiguousarray(np.asarray(constraint_lde))  # (D, 4) u32
    leaves_bytes = arr.reshape(arr.shape[0] // 2, 8).view(np.uint8)  # (D/2, 32)
    return MerkleTree(leaves_bytes, hash_name)


# ------------------------------------------------------------------------------------------------
# step 6: DEEP composition in the evaluation domain
# ------------------------------------------------------------------------------------------------

import jax as _jax


@functools.partial(_jax.jit, static_argnums=(2,))
def _ps_points(bases, prefixes, t):
    """((PC, 4), (PC, 4)) -> (PC, T, 4): per-point power series over one
    tile, scaled by the per-tile prefixes x_p^lo (pre-transferred - host->
    device constants cost a tunnel round trip each).  Built ONCE per tile
    and shared by every register group."""
    ps = _jax.vmap(lambda b: fj.power_series_dev(b, t))(bases)   # (PC, T, 4)
    return fj.mul(ps, prefixes[:, None, :])


@_jax.jit
def _poly_eval_tile_multi(polys_chunk, ps):
    """((RG, T, 4), (PC, T, 4)) -> (PC, RG, 4): partial sums of
    sum_j p[r, j] * x_p^(lo + j) for a chunk of evaluation points at once."""
    prod = fj.mul(polys_chunk[None], ps[:, None, :, :])          # (PC, RG, T, 4)
    return fj.sum_reduce(prod, axis=2)


def _poly_eval_rows_multi_async(polys, x_ints, batch=None):
    """Enqueue T_r(x_p) for every register row r and every point p; returns
    a zero-arg closure producing the (P, R) list-of-lists of host ints.
    All device work and device->host copies START here, so callers can
    overlap the evaluation with other host-side assembly (step 9 overlaps
    the query-row dots with the FRI proof walks).  Replaces P sequential
    single-point sweeps (each paying per-tile host-constant transfers -
    ~25 ms of tunnel latency apiece) with bulk transfers and pure device
    dispatches."""
    from ..ops import tiles

    r, length = polys.shape[0], polys.shape[1]
    # tile no wider than the (power-of-two) poly length: padding a 128-row
    # trace poly to the 2^16 production tile wastes 512x the work and hands
    # CPU XLA a pathologically large kernel to compile
    rg = tiles._RGROUP
    t = min(tiles.TILE, 1 << max(length - 1, 1).bit_length())
    p_total = len(x_ints)
    pc = min(16, max(1, p_total))
    n_tiles = (length + t - 1) // t

    xs = [int(x) % M for x in x_ints]
    rem = (-p_total) % pc
    xs_padded = xs + [0] * rem
    bases_all = fj.from_ints(np.array(xs_padded, dtype=object))      # (P', 4)
    prefixes_all = fj.from_ints(np.array(
        [[pow(x, lo, M) for lo in range(0, length, t)] for x in xs_padded],
        dtype=object))                                               # (P', T#, 4)

    pending = []                                                     # (PC, R', 4)
    for plo in range(0, len(xs_padded), pc):
        totals = None
        for ti, lo in enumerate(range(0, length, t)):
            width = min(t, length - lo)
            ps = _ps_points(bases_all[plo : plo + pc],
                            prefixes_all[plo : plo + pc, ti], t)
            col_parts = []
            for rlo in range(0, r, rg):
                chunk = polys[rlo : rlo + rg, lo : lo + width]
                if chunk.shape[1] < t:
                    chunk = jnp.concatenate(
                        [chunk, jnp.zeros((chunk.shape[0], t - chunk.shape[1], 4),
                                          dtype=jnp.uint32)], axis=1)
                if chunk.shape[0] < rg:
                    chunk = jnp.concatenate(
                        [chunk, jnp.zeros((rg - chunk.shape[0], t, 4),
                                          dtype=jnp.uint32)])
                col_parts.append(_poly_eval_tile_multi(chunk, ps))
            col = (col_parts[0] if len(col_parts) == 1
                   else jnp.concatenate(col_parts, axis=1))
            totals = col if totals is None else fj.add(totals, col)
        if batch is not None:
            pending.append(batch.add(totals))
        else:
            if hasattr(totals, "copy_to_host_async"):
                totals.copy_to_host_async()
            pending.append(totals)

    def result():
        results = []                                                 # (P', R)
        for totals in pending:
            host = batch.get(totals) if batch is not None else np.asarray(totals)
            ints = fj.to_ints(host)                                  # (PC, R')
            for k in range(pc):
                results.append([int(v) for v in ints[k][:r]])
        return results[:p_total]

    return result


def _poly_eval_rows_multi(polys, x_ints):
    """Synchronous _poly_eval_rows_multi_async."""
    return _poly_eval_rows_multi_async(polys, x_ints)()


def _poly_eval_rows(polys, x_int):
    """T_i(x) for every register row of (R, n, 4); returns host ints."""
    return _poly_eval_rows_multi(polys, [x_int])[0]


@functools.partial(_jax.jit, static_argnums=(15,))
def _compose_tiles_batched(a1, a2, c_t, ps, prefixes, z4, nz4, s1, s2,
                           c_at_z, k1, k2, kc, ips, incr_prefixes,
                           use_scan_inv=False):
    """A batch of fixed-shape domain tiles of the DEEP composition in ONE
    dispatch: (T, TILE, 4) operands with (T, 4) per-tile x / x^incr
    prefixes (host pow()s shipped in one transfer - per-tile constants cost
    a tunnel round trip each).  The x / x^incr power series over one tile
    (`ps` / `ips`) arrive prebuilt - recomputing them in-kernel cost ~32
    muls/row, more than the composition's own arithmetic.  The (x-z) and
    (x-zg) inverses come from a single Fermat inversion of their product:
    1/(x-z) = (x-zg) * w and 1/(x-zg) = (x-z) * w with
    w = 1/((x-z)(x-zg)) - halving the dominant 127-squaring chain."""
    t, tl = a1.shape[0], a1.shape[1]
    shape = (t, tl, 4)
    xs = fj.mul(jnp.broadcast_to(ps[None], shape), prefixes[:, None, :])
    xz = fj.sub(xs, jnp.broadcast_to(z4, shape))
    xnz = fj.sub(xs, jnp.broadcast_to(nz4, shape))
    # scan inverse on accelerators (3x less work than Fermat); Fermat on
    # CPU, whose XLA compile of the log-depth scan graph is pathological
    inv = fj.inv_batch_scan if use_scan_inv else fj.inv_batch
    w = inv(fj.mul(xz, xnz))
    u = fj.mul(w, xnz)
    v = fj.mul(w, xz)

    t1 = fj.mul(fj.sub(a1, jnp.broadcast_to(s1, shape)), u)
    t2 = fj.mul(fj.sub(a2, jnp.broadcast_to(s2, shape)), v)
    base = fj.add(t1, t2)

    x_incr = fj.mul(jnp.broadcast_to(ips[None], shape), incr_prefixes[:, None, :])
    part1 = fj.mul(base, jnp.broadcast_to(k1, shape))
    part2 = fj.mul(fj.mul(base, x_incr), jnp.broadcast_to(k2, shape))
    composed = fj.add(part1, part2)

    c_part = fj.mul(
        fj.mul(fj.sub(c_t, jnp.broadcast_to(c_at_z, shape)), u),
        jnp.broadcast_to(kc, shape))
    return fj.add(composed, c_part)


def _build_composition_evaluations(trace, constraint_poly, constraint_lde, z, cc):
    """Step 6, computed pointwise over the evaluation domain in fixed-shape
    tiles (reference trace_table.rs:206-261 / constraint_poly.rs:39-52 build
    the same values by coefficient-space synthetic division)."""
    from ..ops import tiles

    n = trace.domain_size()
    trace_length = trace.unextended_length()

    g = field.get_root_of_unity(trace_length)
    next_z = field.mul(z, g)

    # multi-chip: row-sharded full-domain composition over the mesh (the
    # streaming variant below re-extends weighted sums instead and shards
    # inside the column NTTs - it never materializes the (R, D, 4) LDE)
    from ..parallel.mesh import configured_mesh
    mesh = configured_mesh()
    if mesh is not None and not trace.streaming and n % mesh.devices.size == 0:
        from ..parallel import mesh_stages

        r_count = trace.register_count()
        trace_state1, trace_state2 = _poly_eval_rows_multi(
            trace.polys_dev, [z, next_z])
        s1 = 0
        s2 = 0
        for i in range(r_count):
            s1 = (s1 + trace_state1[i] * cc.trace1[i]) % M
            s2 = (s2 + trace_state2[i] * cc.trace2[i]) % M
        c_at_z = polynom_eval_dev(constraint_poly, z)
        composed = mesh_stages.compose_sharded(
            trace, constraint_lde, z, cc, s1, s2, c_at_z, mesh)
        return composed, DeepValues(trace_state1, trace_state2)

    # weighted register sums A1(x) = sum_i cc1_i T_i(x), A2 likewise
    r_count = trace.register_count()
    w1 = fj.from_ints(np.array(cc.trace1[:r_count], dtype=object))  # (R, 4)
    w2 = fj.from_ints(np.array(cc.trace2[:r_count], dtype=object))
    if trace.streaming:
        # weighted sums commute with the NTT: combine in coefficient space
        # (R x N muls) and extend the single combined column - the full
        # (R, D, 4) LDE is never materialized
        root_d = field.get_root_of_unity(n)

        def extend_wsum(w):
            combo = tiles.weighted_register_sum(trace.polys_dev, w)  # (N, 4)
            padded = jnp.zeros((n, 4), dtype=jnp.uint32)
            padded = padded.at[: combo.shape[0]].set(combo)
            return _extend_column_dev(padded, root_d, "composition_wsum_lde")

        a1 = extend_wsum(w1)
        a2 = extend_wsum(w2)
    else:
        lde = trace.lde_dev  # (R, D, 4)
        a1 = tiles.weighted_register_sum(lde, w1)
        a2 = tiles.weighted_register_sum(lde, w2)

    # T_i(z), T_i(zg) and the scalar DEEP terms - tiny host big-int math on
    # tiled device poly evaluations (these are the proof's DeepValues, so
    # they are needed on the host regardless)
    trace_state1, trace_state2 = _poly_eval_rows_multi(
        trace.polys_dev, [z, next_z])
    s1 = 0
    s2 = 0
    for i in range(r_count):
        s1 = (s1 + trace_state1[i] * cc.trace1[i]) % M
        s2 = (s2 + trace_state2[i] * cc.trace2[i]) % M
    c_at_z = polynom_eval_dev(constraint_poly, z)

    if mesh is not None and n % mesh.devices.size == 0:
        # streaming + mesh: compose from the re-extended weighted sums with
        # the full-domain row-sharded kernel (the tile-loop kernel's CPU
        # compile at production tile sizes is pathological on virtual
        # meshes, and the full-domain kernel shards on real pods anyway)
        from ..parallel import mesh_stages

        composed = mesh_stages.compose_sharded_from_sums(
            a1, a2, constraint_lde, z, cc, s1, s2, c_at_z, mesh, trace_length)
        return composed, DeepValues(trace_state1, trace_state2)

    incr = utils.get_incremental_trace_degree(trace_length)
    root = field.get_root_of_unity(n)
    incr_base = field.exp(root, incr)

    # all per-tile x / x^incr prefixes in two transfers; tiles then run in
    # bounded-size batches (one dispatch each) so the kernel working set
    # stays under the HBM budget at north-star domains while small proofs
    # compose in a single dispatch
    tile = tiles.TILE
    n_tiles = (n + tile - 1) // tile
    x_prefixes = fj.from_ints(np.array(
        [field.exp(root, lo) for lo in range(0, n, tile)], dtype=object))
    i_prefixes = fj.from_ints(np.array(
        [field.exp(incr_base, lo) for lo in range(0, n, tile)], dtype=object))

    def pad_tiles(arr):
        rem = (-arr.shape[0]) % tile
        if rem:
            arr = jnp.concatenate(
                [arr, jnp.zeros((rem, 4), dtype=jnp.uint32)])
        return arr.reshape(n_tiles, tile, 4)

    a1_t, a2_t, c_t = pad_tiles(a1), pad_tiles(a2), pad_tiles(constraint_lde)
    consts = (fj.constant(z), fj.constant(next_z),
              fj.constant(s1), fj.constant(s2), fj.constant(c_at_z),
              fj.constant(cc.t1_degree), fj.constant(cc.t2_degree),
              fj.constant(cc.constraints))
    (z4, nz4, s1_4, s2_4, caz4, k1, k2, kc) = consts
    # x / x^incr power series over ONE tile, prebuilt (cached executables)
    ps = tiles.power_series(root, tile)
    ips = tiles.power_series(incr_base, tile)

    batch = max(1, int(os.environ.get("DISTAFF_COMPOSE_TILES", 32)))
    use_scan_inv = any(d.platform != "cpu" for d in a1.devices())
    parts = []
    for lo in range(0, n_tiles, batch):
        hi = min(lo + batch, n_tiles)
        parts.append(_compose_tiles_batched(
            a1_t[lo:hi], a2_t[lo:hi], c_t[lo:hi],
            ps, x_prefixes[lo:hi], z4, nz4, s1_4, s2_4, caz4,
            k1, k2, kc, ips, i_prefixes[lo:hi],
            use_scan_inv).reshape(-1, 4))
    composed = (parts[0] if len(parts) == 1 else jnp.concatenate(parts))[:n]

    deep_values = DeepValues(trace_state1, trace_state2)
    return composed, deep_values


def polynom_eval_dev(poly_dev, x_int):
    """Evaluate an (n, 4) device coefficient vector at a host int."""
    return _poly_eval_rows_multi(poly_dev[None], [x_int])[0][0]
