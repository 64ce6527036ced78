"""Known-answer tests for the arithmetic hashes (reference src/crypto/hash.rs:258-297)."""

from distaff_tpu.math import field
from distaff_tpu.crypto.hashes import poseidon, rescue, gmimc, sha3


INPUT = b"".join(field.to_bytes(v) for v in [1, 2, 3, 4])


def test_poseidon_kat():
    assert list(poseidon(INPUT)) == [
        224, 9, 85, 92, 75, 117, 136, 23, 142, 67, 249, 199, 39, 177, 97, 129,
        93, 192, 153, 131, 76, 160, 94, 162, 200, 192, 187, 5, 159, 69, 48, 165,
    ]


def test_rescue_kat():
    assert list(rescue(INPUT)) == [
        148, 191, 96, 185, 107, 196, 170, 28, 161, 214, 196, 211, 158, 111, 135, 32,
        122, 173, 195, 37, 123, 60, 246, 104, 176, 53, 127, 67, 38, 208, 69, 54,
    ]


def test_gmimc_kat():
    assert list(gmimc(INPUT)) == [
        115, 208, 64, 41, 162, 43, 134, 243, 236, 80, 161, 106, 195, 234, 30, 26,
        71, 74, 255, 77, 41, 125, 25, 152, 162, 106, 65, 108, 84, 216, 37, 37,
    ]


def test_sha3_is_sha3_256():
    assert sha3(b"").hex().startswith("a7ffc6f8")
