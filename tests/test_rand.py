"""ChaCha20 / StdRng transcript PRNG tests.

The all-zero-key ChaCha20 keystream (counter 0) is a standard published
vector; rand 0.7's StdRng is ChaCha20Rng with the seed as key, so the first
64 bytes of its output must equal that keystream.
"""

from distaff_tpu.math import field
from distaff_tpu.utils.rand import StdRng, chacha20_block, prng, prng_vector, usize_iter


def test_chacha20_zero_key_block0():
    words = chacha20_block([0] * 8, 0)
    stream = b"".join(w.to_bytes(4, "little") for w in words)
    assert stream.hex() == (
        "76b8e0ada0f13d90405d6ae55386bd28"
        "bdd219b8a08ded1aa836efcc8b770dc7"
        "da41597c5157488d7724e03fb8d84a37"
        "6a43b8f41518a11cc387b669b2ee6586"
    )


def test_stdrng_u64_stream():
    rng = StdRng(b"\x00" * 32)
    words = chacha20_block([0] * 8, 0)
    assert rng.next_u64() == (words[1] << 32) | words[0]
    assert rng.next_u64() == (words[3] << 32) | words[2]
    # consume to the refill boundary: 64 words total across 4 blocks
    for _ in range(30):
        rng.next_u64()
    block4 = chacha20_block([0] * 8, 4)
    assert rng.next_u64() == (block4[1] << 32) | block4[0]


def test_prng_properties():
    seed = bytes(range(32))
    v1 = prng(seed, field.M)
    v2 = prng(seed, field.M)
    assert v1 == v2 and 0 <= v1 < field.M
    vec = prng_vector(seed, 10, field.M)
    assert vec[0] == v1  # first draw matches single-draw
    assert len(set(vec)) == 10


def test_usize_iter_power_of_two_bound():
    seed = bytes(range(32))
    it = usize_iter(seed, 1 << 13)
    values = [next(it) for _ in range(100)]
    assert all(0 <= v < (1 << 13) for v in values)
    # for power-of-2 bounds the sampler is hi-bits of one u64 draw, no rejection
    rng = StdRng(seed)
    assert values[0] == rng.next_u64() >> (64 - 13)
