"""Multi-chip sharding tests on the virtual CPU mesh."""

import random

import numpy as np
import pytest
import jax

from distaff_tpu.math import field
from distaff_tpu.math import field_jax as fj
from distaff_tpu.parallel.mesh import make_mesh
from distaff_tpu.parallel import ntt_sharded as ns

pytestmark = pytest.mark.heavy  # full proofs / mesh / compile-heavy


def _require_devices(n):
    if len(jax.devices("cpu")) < n:
        pytest.skip(f"need {n} virtual devices")


@pytest.mark.parametrize("n,d", [(256, 4), (1024, 8)])
def test_sharded_ntt_matches_single_chip(n, d):
    _require_devices(d)
    mesh = make_mesh(d)
    rng = random.Random(n)
    x = fj.from_ints([rng.randrange(field.M) for _ in range(n)])
    got = ns.ntt_sharded(x, mesh)
    expected = fj.ntt(x)
    assert (np.asarray(got) == np.asarray(expected)).all()


def test_sharded_intt_roundtrip():
    _require_devices(4)
    mesh = make_mesh(4)
    rng = random.Random(7)
    x = fj.from_ints([rng.randrange(field.M) for _ in range(512)])
    back = ns.intt_sharded(ns.ntt_sharded(x, mesh), mesh)
    assert (np.asarray(back) == np.asarray(x)).all()


def test_mesh_prove_bit_identical(monkeypatch):
    """An end-to-end proof generated on a 4-device mesh (register-sharded
    LDE via DISTAFF_MESH_DEVICES) must be byte-identical to the
    single-device proof - sharding only moves where the field math runs."""
    _require_devices(4)
    import distaff_tpu
    from distaff_tpu import assembly, ProgramInputs, ProofOptions
    from distaff_tpu.stark import serde

    program = assembly.compile("begin repeat.4 swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=2)

    outputs1, proof1 = distaff_tpu.execute(program, inputs, 1, options)

    monkeypatch.setenv("DISTAFF_MESH_DEVICES", "4")
    outputs2, proof2 = distaff_tpu.execute(program, inputs, 1, options)

    assert outputs1 == outputs2
    assert serde.serialize(proof1) == serde.serialize(proof2)
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs2, proof2)


def test_mesh_prove_8dev_all_stages_sharded(monkeypatch):
    """8-device mesh proof: byte-identical to single-device AND every
    pipeline stage actually ran with a mesh sharding (inspected via
    mesh_stages.RECORDED_SHARDINGS - the transition AIR, boundary columns,
    DEEP composition, and FRI folds each record their operand's sharding)."""
    _require_devices(8)
    import distaff_tpu
    from distaff_tpu import assembly, ProgramInputs, ProofOptions
    from distaff_tpu.parallel import mesh_stages
    from distaff_tpu.stark import serde

    # just large enough that every stage (incl. FRI's first fold and the
    # AIR sweep) sees row counts divisible by 8; the op-by-op sharded AIR
    # makes this test's cost scale steeply with trace length
    program = assembly.compile("begin repeat.2 swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=2)

    outputs1, proof1 = distaff_tpu.execute(program, inputs, 1, options)

    mesh_stages.RECORDED_SHARDINGS.clear()
    monkeypatch.setenv("DISTAFF_MESH_DEVICES", "8")
    # force the sharded AIR stage (on CPU meshes "auto" keeps the native
    # sweep; transition_sharded itself drops to op-by-op execution on CPU,
    # where the fused kernel's XLA compile is pathological)
    monkeypatch.setenv("DISTAFF_MESH_AIR", "1")
    outputs2, proof2 = distaff_tpu.execute(program, inputs, 1, options)

    assert outputs1 == outputs2
    assert serde.serialize(proof1) == serde.serialize(proof2)
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs2, proof2)

    recorded = mesh_stages.RECORDED_SHARDINGS
    for stage in ("transition", "boundaries", "composition", "fri_fold"):
        assert stage in recorded, f"stage {stage} never took the mesh path"
        sharding = recorded[stage]
        assert getattr(sharding, "num_devices", None) == 8 or (
            hasattr(sharding, "mesh") and sharding.mesh.devices.size == 8), (
            f"stage {stage} not sharded over 8 devices: {sharding}")
        assert not sharding.is_fully_replicated, (
            f"stage {stage} fully replicated: {sharding}")
