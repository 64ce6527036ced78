"""Mesh-sharded variants of the proving-pipeline stages.

When a mesh is configured (DISTAFF_MESH_DEVICES > 1) the prover swaps its
fixed-tile single-device loops for full-domain jitted stages whose inputs
carry explicit `NamedSharding`s; XLA's SPMD partitioner then splits every
pointwise stage across the mesh and inserts the resharding collectives at
layout changes (register-sharded LDE -> row-sharded pointwise work is one
all-to-all that rides the ICI).  Values are bit-identical to the
single-device path - sharding only moves where the same field math runs.

Stage -> sharding map (the reference's entire concurrency surface,
src/math/parallel.rs:10-179 and src/math/fft.rs:29-38, becomes these
placements):

- trace LDE:        register axis      P("shard", None, None)  (trace_table)
- transition AIR:   domain-row axis    P(None, "shard", None)  (here)
- boundary columns: domain-row axis    P(None, "shard", None)  (here)
- DEEP composition: domain-row axis    P("shard", None)        (here)
- FRI folds:        row axis           P("shard", None, None)  (here)
- Merkle subtrees:  subtree axis       P("shard", None, None)  (here)

For inspection (tests assert each stage actually sharded) every mesh-path
entry point records the sharding of its main output in RECORDED_SHARDINGS.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..math import field
from ..math import field_jax as fj

# stage name -> jax.sharding.Sharding of that stage's primary operand,
# recorded on every mesh-path call (cleared by tests as needed)
RECORDED_SHARDINGS = {}


def _record(stage, arr):
    RECORDED_SHARDINGS[stage] = arr.sharding


def rows3(mesh):
    """(R, D, 4) arrays sharded along the domain-row axis."""
    return NamedSharding(mesh, P(None, "shard", None))


def rows2(mesh):
    """(D, 4) arrays sharded along the row axis."""
    return NamedSharding(mesh, P("shard", None))


# ------------------------------------------------------------------------------------------------
# step 3: transition AIR over the evaluation domain, domain-rows sharded
# ------------------------------------------------------------------------------------------------

def transition_sharded(evaluator, trace, mesh, debug_check=True):
    """Full-domain transition sweep with the row axis sharded.

    Reuses the single-device fused AIR kernel (device_eval._transition_kernel)
    with chunk == n_ev and row-sharded lde/next operands; every constraint is
    pointwise over rows, so the SPMD partitioner splits the whole sweep with
    no communication (the 8-rows-ahead operand is materialized before the
    kernel, so the halo exchange happens in one jnp.roll, not per row)."""
    from ..stark.constraints.device_eval import (
        _device_constants, _transition_kernel)
    from ..config import MAX_CONSTRAINT_DEGREE

    stride = trace.extension_factor // MAX_CONSTRAINT_DEGREE
    lde = (trace.lde_stride_dev if trace.streaming
           else trace.lde_dev[:, ::stride, :])
    n_ev = lde.shape[1]

    # chunk == n_ev: the full-domain kernel gets full-length xp series
    dec_ark, dec_masks, stk_ark, xp_series = _device_constants(evaluator, n_ev)
    cc = fj.from_ints(np.array(evaluator.coefficients.transition, dtype=object))
    groups = tuple(tuple(cs) for _, cs in evaluator.t_degree_groups)

    ext = jnp.concatenate(
        [lde[:, MAX_CONSTRAINT_DEGREE:], lde[:, :MAX_CONSTRAINT_DEGREE]], axis=1)
    lde = jax.device_put(lde, rows3(mesh))
    ext = jax.device_put(ext, rows3(mesh))
    _record("transition", lde)

    xp_prefix = fj.from_ints(np.array(
        [1] * len(evaluator.t_degree_groups), dtype=object))
    last_step_row = n_ev - MAX_CONSTRAINT_DEGREE

    # the fused AIR kernel's CPU XLA compile is pathological (>10 min), so
    # on a (virtual) CPU mesh the same math runs op-by-op; shardings
    # propagate identically through eager ops on the sharded operands
    import contextlib

    on_cpu = all(d.platform == "cpu" for d in mesh.devices.flat)
    ctx = jax.disable_jit() if on_cpu else contextlib.nullcontext()
    with ctx:
        combined, bad = _transition_kernel(
            lde, ext, dec_ark, dec_masks, stk_ark, cc, xp_series,
            xp_prefix, jnp.asarray(last_step_row, jnp.int32),
            jnp.asarray(n_ev, jnp.int32),
            ctx_depth=evaluator.ctx_depth, loop_depth=evaluator.loop_depth,
            stack_depth=evaluator.stack_depth, groups=groups)
    if debug_check:
        assert int(bad) == 0, (
            f"transition constraints not satisfied at {int(bad)} trace steps")
    return combined


# ------------------------------------------------------------------------------------------------
# step 3: boundary columns, domain-rows sharded
# ------------------------------------------------------------------------------------------------

def boundaries_sharded(evaluator, trace, stride, mesh):
    """Weighted register sums + x^adj degree adjustment, rows sharded
    (mesh analogue of prover._evaluate_boundaries_device)."""
    n_ev = evaluator.domain_size
    lde = (trace.lde_stride_dev if trace.streaming
           else trace.lde_dev[:, ::stride, :])
    lde = jax.device_put(lde, rows3(mesh))
    _record("boundaries", lde)
    r_ev = field.get_root_of_unity(n_ev)
    xp_base = fj.constant(field.exp(r_ev, evaluator.b_degree_adj))

    i_parts, f_parts = evaluator.boundary_weight_vectors(lde.shape[0])

    @jax.jit
    def _combine(lde, w1, w2, c1, c2, xb):
        s1 = fj.sum_reduce(fj.mul(lde, w1[:, None, :]), axis=0)
        s2 = fj.sum_reduce(fj.mul(lde, w2[:, None, :]), axis=0)
        xp = fj.power_series_dev(xb, lde.shape[1])
        base = fj.add(s1, jnp.broadcast_to(c1, (lde.shape[1], 4)))
        adj = fj.add(s2, jnp.broadcast_to(c2, (lde.shape[1], 4)))
        return fj.add(base, fj.mul(xp, adj))

    def combine(parts):
        w1, w2, c1, c2 = parts
        return _combine(
            lde,
            fj.from_ints(np.array(w1, dtype=object)),
            fj.from_ints(np.array(w2, dtype=object)),
            fj.constant(c1), fj.constant(c2), xp_base)

    return combine(i_parts), combine(f_parts)


# ------------------------------------------------------------------------------------------------
# step 6: DEEP composition, domain-rows sharded
# ------------------------------------------------------------------------------------------------

@jax.jit
def _compose_full(a1, a2, c_lde, root4, z4, nz4, s1, s2, c_at_z,
                  k1, k2, kc, incr_base):
    """Full-domain DEEP composition (same math as prover._compose_tile with
    tile == domain; the x power series build via scanned doublings shards
    over rows because the row-index iota does)."""
    n = a1.shape[0]
    xs = fj.power_series_dev(root4, n)
    xz = fj.sub(xs, jnp.broadcast_to(z4, (n, 4)))
    xnz = fj.sub(xs, jnp.broadcast_to(nz4, (n, 4)))
    w = fj.inv_batch(fj.mul(xz, xnz))   # one Fermat chain for both inverses
    u = fj.mul(w, xnz)
    v = fj.mul(w, xz)

    t1 = fj.mul(fj.sub(a1, jnp.broadcast_to(s1, (n, 4))), u)
    t2 = fj.mul(fj.sub(a2, jnp.broadcast_to(s2, (n, 4))), v)
    base = fj.add(t1, t2)

    x_incr = fj.power_series_dev(incr_base, n)
    part1 = fj.mul(base, jnp.broadcast_to(k1, (n, 4)))
    part2 = fj.mul(fj.mul(base, x_incr), jnp.broadcast_to(k2, (n, 4)))
    composed = fj.add(part1, part2)

    c_part = fj.mul(
        fj.mul(fj.sub(c_lde, jnp.broadcast_to(c_at_z, (n, 4))), u),
        jnp.broadcast_to(kc, (n, 4)))
    return fj.add(composed, c_part)


@jax.jit
def _wsum_full(lde, w):
    """sum_i w[i] * lde[i] over (R, D, 4), rows sharded."""
    return fj.sum_reduce(fj.mul(lde, w[:, None, :]), axis=0)


def compose_sharded_from_sums(a1, a2, constraint_lde, z, cc_obj, s1, s2,
                              c_at_z, mesh, trace_length):
    """Row-sharded DEEP composition from precomputed weighted register sums
    (the streaming path extends A1/A2 in coefficient space - the full LDE
    never exists - then composes here with the same full-domain kernel)."""
    from ..stark import utils as stark_utils

    n = a1.shape[0]
    a1 = jax.device_put(a1, rows2(mesh))
    a2 = jax.device_put(a2, rows2(mesh))
    c_lde = jax.device_put(constraint_lde, rows2(mesh))
    _record("composition", c_lde)

    g = field.get_root_of_unity(trace_length)
    next_z = field.mul(z, g)
    incr = stark_utils.get_incremental_trace_degree(trace_length)
    root = field.get_root_of_unity(n)

    return _compose_full(
        a1, a2, c_lde,
        fj.constant(root), fj.constant(z), fj.constant(next_z),
        fj.constant(s1), fj.constant(s2), fj.constant(c_at_z),
        fj.constant(cc_obj.t1_degree), fj.constant(cc_obj.t2_degree),
        fj.constant(cc_obj.constraints), fj.constant(field.exp(root, incr)))


def compose_sharded(trace, constraint_lde, z, cc_obj, s1, s2, c_at_z, mesh):
    """Row-sharded DEEP composition evaluations (mesh analogue of
    prover._build_composition_evaluations' tile loop)."""
    from ..stark import utils as stark_utils

    n = trace.domain_size()
    r_count = trace.register_count()
    lde = jax.device_put(trace.lde_dev, rows3(mesh))
    c_lde = jax.device_put(constraint_lde, rows2(mesh))
    _record("composition", c_lde)

    w1 = fj.from_ints(np.array(cc_obj.trace1[:r_count], dtype=object))
    w2 = fj.from_ints(np.array(cc_obj.trace2[:r_count], dtype=object))
    a1 = _wsum_full(lde, w1)
    a2 = _wsum_full(lde, w2)

    g = field.get_root_of_unity(trace.unextended_length())
    next_z = field.mul(z, g)
    incr = stark_utils.get_incremental_trace_degree(trace.unextended_length())
    root = field.get_root_of_unity(n)

    return _compose_full(
        a1, a2, c_lde,
        fj.constant(root), fj.constant(z), fj.constant(next_z),
        fj.constant(s1), fj.constant(s2), fj.constant(c_at_z),
        fj.constant(cc_obj.t1_degree), fj.constant(cc_obj.t2_degree),
        fj.constant(cc_obj.constraints), fj.constant(field.exp(root, incr)))


# ------------------------------------------------------------------------------------------------
# step 7: FRI folds, row axis sharded
# ------------------------------------------------------------------------------------------------

def fold_sharded(p_values, x0, x0_inv3, special_x, mesh):
    """One radix-4 fold with the row axis sharded (each row folds
    independently; no communication)."""
    from ..ops.fri_jax import _fold_rows_impl

    q = p_values.shape[0]
    n_dev = mesh.devices.size
    if q % n_dev != 0:
        # tiny layers: not worth sharding (and the row count stops dividing
        # the mesh); fall back to single-device fold
        from ..ops import tiles
        return tiles.fold_rows(p_values, x0, x0_inv3, special_x)
    ys = jax.device_put(p_values, NamedSharding(mesh, P("shard", None, None)))
    xs = jax.device_put(x0, rows2(mesh))
    ixs = jax.device_put(x0_inv3, rows2(mesh))
    _record("fri_fold", ys)
    return jax.jit(_fold_rows_impl)(ys, xs, ixs, special_x)


# ------------------------------------------------------------------------------------------------
# step 2/5: Merkle subtree builds, subtree axis sharded
# ------------------------------------------------------------------------------------------------

def subtree_nodes_sharded(grouped, mesh):
    """(n_sub, SUBTREE, 8) leaf groups -> (n_sub, SUBTREE, 8) local node
    arrays with the independent subtree builds sharded across the mesh."""
    from ..crypto.merkle_dev import _build_subtree_nodes

    n_sub = grouped.shape[0]
    n_dev = mesh.devices.size
    if n_sub % n_dev != 0:
        return None  # caller falls back to the tiled single-device loop
    g = jax.device_put(grouped, NamedSharding(mesh, P("shard", None, None)))
    _record("merkle_subtrees", g)
    return _build_subtree_nodes(g)
