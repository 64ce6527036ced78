"""Streaming-LDE equivalence tests.

The streaming path (trace_table.py: extend + _stream_commit, used when the
full LDE would not fit HBM) must produce bit-identical commitments, slices,
and query rows to the materialized path.  Components are compared directly
on the CPU backend; the full streaming proof is exercised end-to-end on TPU
by tools/profile_large.py / bench.py at 2^20 (where verify() checks it).
"""

import numpy as np
import pytest

import distaff_tpu
from distaff_tpu import assembly, ProgramInputs
from distaff_tpu.math import field
from distaff_tpu.math import field_jax as fj
from distaff_tpu.processor import execute as vm_execute
from distaff_tpu.stark.trace_table import TraceTable

pytestmark = pytest.mark.heavy  # full proofs / mesh / compile-heavy


@pytest.fixture(scope="module")
def traces():
    program = assembly.compile("begin repeat.8 swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    regs, ctx_depth, loop_depth = vm_execute(program, inputs)

    plain = TraceTable(regs, ctx_depth, loop_depth, 16)
    plain.extend()

    stream = TraceTable(regs, ctx_depth, loop_depth, 16)
    stream.extend()
    assert not stream.streaming  # auto mode never streams tiny traces
    stream.streaming = True      # force the streaming machinery
    stream.lde_dev = None
    stream._stream_commit()
    return plain, stream


def test_stream_polys_match(traces):
    plain, stream = traces
    assert (np.asarray(plain.polys_dev) == np.asarray(stream.polys_dev)).all()


def test_stream_commit_matches_materialized(traces):
    plain, stream = traces
    # leaf digests: incremental block absorption == whole-row hashing
    from distaff_tpu.ops.blake3_jax import hash_trace_rows_dev
    want = np.asarray(hash_trace_rows_dev(plain.lde_dev))
    got = np.asarray(stream._leaf_digests)
    assert (got == want).all()

    # the D_ev stride slice buffer == a strided view of the full LDE
    stride = plain.extension_factor // 8
    want_slice = np.asarray(plain.lde_dev[:, ::stride, :])
    assert (np.asarray(stream.lde_stride_dev) == want_slice).all()

    # and the Merkle roots agree
    assert (plain.build_merkle_tree("blake3").root()
            == stream.build_merkle_tree("blake3").root())


def test_stream_commit_partitioned_absorb_matches(traces, monkeypatch):
    """The domain-partitioned absorb (DISTAFF_ABSORB_PART_ROWS, the 2^25-row
    HBM guard) must produce the same leaf digests as the whole-domain pass -
    parts are row-independent, so this pins the bookkeeping (power-of-two
    part sizes only)."""
    plain, stream = traces
    program = assembly.compile("begin repeat.8 swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    regs, ctx_depth, loop_depth = vm_execute(program, inputs)

    monkeypatch.setenv("DISTAFF_ABSORB_PART_ROWS", "256")
    parted = TraceTable(regs, ctx_depth, loop_depth, 16)
    parted.extend()
    parted.streaming = True
    parted.lde_dev = None
    parted._stream_commit()
    assert parted.domain_size() // 256 > 1  # actually multi-part
    assert (np.asarray(parted._leaf_digests)
            == np.asarray(stream._leaf_digests)).all()


def test_stream_query_rows_match(traces):
    plain, stream = traces
    positions = [1, 7, 30, 101, plain.domain_size() - 2]
    assert (stream.get_register_values_at(positions)
            == plain.get_register_values_at(positions))


def test_stream_mesh_prove_bit_identical(monkeypatch):
    """Streaming + mesh proving (the north-star configuration: a trace whose
    LDE exceeds one device's HBM proves on a mesh with every per-register
    streaming NTT itself sharded) must produce the same proof bytes as
    single-device materialized proving, with the intra-NTT four-step path
    recorded in RECORDED_SHARDINGS."""
    import jax

    if len(jax.devices("cpu")) < 4:
        pytest.skip("need 4 virtual devices")
    from distaff_tpu import ProofOptions
    from distaff_tpu.parallel import mesh_stages
    from distaff_tpu.stark import serde

    program = assembly.compile("begin repeat.4 swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions(extension_factor=16, num_queries=10,
                           grinding_factor=2)

    outputs1, proof1 = distaff_tpu.execute(program, inputs, 1, options)

    mesh_stages.RECORDED_SHARDINGS.clear()
    monkeypatch.setenv("DISTAFF_MESH_DEVICES", "4")
    monkeypatch.setenv("DISTAFF_STREAM_LDE", "1")
    monkeypatch.setenv("DISTAFF_MESH_NTT", "1")  # force on the CPU mesh
    outputs2, proof2 = distaff_tpu.execute(program, inputs, 1, options)

    assert outputs1 == outputs2
    assert serde.serialize(proof1) == serde.serialize(proof2)
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs2, proof2)

    recorded = mesh_stages.RECORDED_SHARDINGS
    for stage in ("stream_ntt", "constraint_lde", "constraint_intt",
                  "composition_wsum_lde"):
        assert stage in recorded, f"stage {stage} never took the mesh path"
        assert not recorded[stage].is_fully_replicated, (
            f"stage {stage} fully replicated: {recorded[stage]}")


def test_stream_wide_trace_two_chunk_commit():
    """A max-geometry-style trace (> 64 registers -> 1040-byte rows, i.e.
    TWO BLAKE3 chunks per row: deep ctx nesting + nested while loops + a
    31-deep user stack, per reference src/lib.rs:109-139) must stream with
    the multi-chunk device commitment bit-identical to the materialized
    tree."""
    pushes = " ".join(f"push.{i + 1}" for i in range(31))
    loop3 = ("push.1 while.true push.1 while.true push.1 while.true "
             "push.0 end push.0 end push.0 end")
    src = ("begin " + pushes + " " + "block " * 12 + loop3 + " end " * 12
           + " add end")
    program = assembly.compile(src)
    regs, ctx_depth, loop_depth = vm_execute(program, ProgramInputs.none())
    assert len(regs) > 64, f"geometry probe drifted: {len(regs)} registers"

    plain = TraceTable(regs, ctx_depth, loop_depth, 16)
    plain.extend()
    stream = TraceTable(regs, ctx_depth, loop_depth, 16)
    stream.extend()
    stream.streaming = True
    stream.lde_dev = None
    stream._stream_commit()

    # oracle: the HOST hashing path (device hashing disabled) - pins the
    # multi-chunk device BLAKE3 against the spec implementation
    import os

    os.environ["DISTAFF_DEVICE_HASH"] = "0"
    try:
        host_root = plain.build_merkle_tree("blake3").root()
    finally:
        del os.environ["DISTAFF_DEVICE_HASH"]
    assert stream.build_merkle_tree("blake3").root() == host_root
    stride = plain.extension_factor // 8
    assert (np.asarray(stream.lde_stride_dev)
            == np.asarray(plain.lde_dev[:, ::stride, :])).all()


def test_stream_weighted_sum_commutes(traces):
    # weighted register sums in coefficient space, then NTT == weighted
    # sums of the extended LDE (the streaming DEEP-composition identity)
    from distaff_tpu.ops import tiles

    plain, stream = traces
    r = plain.register_count()
    rng = np.random.default_rng(5)
    w = fj.from_ints(np.array(
        [int.from_bytes(rng.bytes(16), "little") % field.M for _ in range(r)],
        dtype=object))

    want = np.asarray(tiles.weighted_register_sum(plain.lde_dev, w))

    import jax.numpy as jnp
    n = plain.domain_size()
    combo = tiles.weighted_register_sum(stream.polys_dev, w)
    padded = jnp.zeros((n, 4), dtype=jnp.uint32).at[: combo.shape[0]].set(combo)
    got = np.asarray(tiles.ntt(padded, field.get_root_of_unity(n)))
    assert (got == want).all()
