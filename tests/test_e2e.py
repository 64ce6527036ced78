"""End-to-end prove -> verify integration tests (mirrors reference src/tests/mod.rs)."""

import pytest

import distaff_tpu
from distaff_tpu import assembly, ProgramInputs, ProofOptions
from distaff_tpu.stark import serde

pytestmark = pytest.mark.heavy  # full proofs / mesh / compile-heavy


@pytest.fixture(scope="module")
def toy_proof():
    program = assembly.compile("begin push.3 push.5 add end")
    inputs = ProgramInputs.none()
    options = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=2)
    outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
    return program, inputs, outputs, proof


def test_execute_verify(toy_proof):
    program, inputs, outputs, proof = toy_proof
    assert outputs == [8]
    assert distaff_tpu.verify(program.hash, inputs.get_public_inputs(), outputs, proof)


def test_tampered_claims_rejected(toy_proof):
    program, inputs, outputs, proof = toy_proof
    with pytest.raises(Exception):
        distaff_tpu.verify(program.hash, inputs.get_public_inputs(), [9], proof)
    with pytest.raises(Exception):
        distaff_tpu.verify(program.hash, [1], outputs, proof)
    with pytest.raises(Exception):
        distaff_tpu.verify(b"\x00" * 32, inputs.get_public_inputs(), outputs, proof)


def test_serde_roundtrip(toy_proof):
    program, inputs, outputs, proof = toy_proof
    blob = serde.serialize(proof)
    proof2 = serde.deserialize(blob)
    assert serde.serialize(proof2) == blob
    assert distaff_tpu.verify(program.hash, inputs.get_public_inputs(), outputs, proof2)


def test_debug_degree_validation(monkeypatch):
    # DISTAFF_DEBUG turns on the constraint-polynomial degree assertion
    # (reference constraint_poly.rs:13-26); an honest trace must pass it
    monkeypatch.setenv("DISTAFF_DEBUG", "1")
    program = assembly.compile("begin push.7 push.11 mul end")
    inputs = ProgramInputs.none()
    options = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=2)
    outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
    assert outputs == [77]
    assert distaff_tpu.verify(program.hash, inputs.get_public_inputs(), outputs, proof)


def test_misdeclared_degree_caught(monkeypatch):
    # the per-constraint degree validation (reference
    # constraint_table.rs:90-112) must reject a deliberately under-declared
    # degree: the active constraints' actual degrees then exceed it
    monkeypatch.setenv("DISTAFF_DEBUG", "1")
    from distaff_tpu.stark.constraints.evaluator import Evaluator

    real = Evaluator.transition_degrees
    monkeypatch.setattr(
        Evaluator, "transition_degrees", lambda self: [0] * len(real(self)))
    program = assembly.compile("begin push.3 push.5 add end")
    options = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=2)
    with pytest.raises(AssertionError, match="constraint degrees"):
        distaff_tpu.execute(program, ProgramInputs.none(), 1, options)


def test_sharded_dryrun():
    # virtual multi-device mesh comes from conftest's XLA_FLAGS
    import jax
    n = min(4, len(jax.devices("cpu")))
    if n < 2:
        pytest.skip("need at least 2 (virtual) devices")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(n)
