"""Proof-byte determinism regression.

The serialized proof for a fixed (program, inputs, options) is a pure
function of the protocol: any accidental change to the Fiat-Shamir
transcript, hashing, coefficient layouts, serialization, or field math
changes these bytes.  The golden hash pins the round-1 transcript; update
it ONLY for intentional protocol changes (and say so in the commit).
"""

import pytest
import hashlib

import distaff_tpu
from distaff_tpu import assembly, ProgramInputs, ProofOptions
from distaff_tpu.stark import serde

# core tier: the golden-transcript regression is the cheapest whole-protocol
# signal (one small proof, ~80 s on CPU) and belongs in every default run

GOLDEN_SHA256 = "876d9f49cddbe11a3b360c04245d3b29712b6309a1eb446af835b123c729c842"
GOLDEN_LEN = 12926


def test_proof_bytes_are_reproducible():
    program = assembly.compile("begin push.3 push.5 add end")
    inputs = ProgramInputs.none()
    options = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=2)
    _, proof = distaff_tpu.execute(program, inputs, 1, options)
    blob = serde.serialize(proof)
    assert len(blob) == GOLDEN_LEN
    assert hashlib.sha256(blob).hexdigest() == GOLDEN_SHA256
