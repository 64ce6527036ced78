"""Freshness guard for the committed Rust cross-check bundle.

crosscheck_bundle/proof.bin is the evidence a Rust-equipped machine uses to
validate byte-compatibility against the unmodified reference `verify()`
(reference src/lib.rs:72, stark/proof.rs:10).  The bundle is a fixed copy,
so a transcript-affecting change could silently strand it while every other
test stays green: this test regenerates the fixture proof and asserts the
bytes still match.  If it fails after an INTENTIONAL protocol change,
regenerate with `python tools/rust_crosscheck.py` and say so in the commit.
"""

import json
import pathlib

import distaff_tpu
from distaff_tpu import assembly, ProgramInputs, ProofOptions
from distaff_tpu.stark import serde

BUNDLE = pathlib.Path(__file__).resolve().parent.parent / "crosscheck_bundle"


def test_bundle_proof_bytes_match_current_prover():
    fixture = json.loads((BUNDLE / "fixture.json").read_text())
    program = assembly.compile(fixture["source"])
    assert program.hash.hex() == fixture["program_hash_hex"]

    opts = fixture["options"]
    options = ProofOptions(
        extension_factor=opts["extension_factor"],
        num_queries=opts["num_queries"],
        grinding_factor=opts["grinding_factor"],
        hash_fn=opts["hash_fn"],
    )
    inputs = ProgramInputs.from_public(
        [int(v) for v in fixture["public_inputs"]])
    outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
    assert [str(o) for o in outputs] == fixture["outputs"]

    blob = serde.serialize(proof)
    golden = (BUNDLE / "proof.bin").read_bytes()
    assert blob == golden, (
        "crosscheck_bundle/proof.bin no longer matches the current prover "
        "output - regenerate the bundle (tools/rust_crosscheck.py) if the "
        "transcript change was intentional")
