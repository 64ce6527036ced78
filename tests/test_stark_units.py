"""STARK subsystem unit tests: trace-state flags, FRI round trips, PoW,
options (mirroring reference src/stark/trace/trace_state.rs:500-556,
src/stark/fri/mod.rs:39-95, proof_of_work.rs, options.rs)."""

import random

import pytest

from distaff_tpu.math import field, polynom
from distaff_tpu.math import field_jax as fj
from distaff_tpu.stark.trace_state import TraceState
from distaff_tpu.stark.options import ProofOptions
from distaff_tpu.stark import fri, utils

# core tier: these unit oracles (FRI round-trip, synthetic divisions, PoW)
# run in seconds and guard protocol soundness


def _state(vec, ctx=1, loop=0, stack=2):
    return TraceState.from_vec(ctx, loop, stack, vec)


def test_op_flags_reference_vectors():
    # all zeros -> cf flag 0 set, begin flag set (reference trace_state.rs:504-515)
    s = _state([101, 1, 2, 3, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 15, 16, 17])
    assert s.cf_op_flags() == [1, 0, 0, 0, 0, 0, 0, 0]
    assert s.ld_op_flags() == [0] * 32
    assert s.hd_op_flags() == [0, 0, 0, 0]
    assert s.begin_flag() == 1 and s.noop_flag() == 0

    # all ones -> VOID / NOOP
    s = _state([101, 1, 2, 3, 4, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 15, 16, 17])
    assert s.cf_op_flags() == [0] * 7 + [1]
    assert s.ld_op_flags() == [0] * 31 + [1]
    assert s.hd_op_flags() == [0, 0, 0, 1]
    assert s.begin_flag() == 0 and s.noop_flag() == 1

    # mixed 1 (reference trace_state.rs:531-543)
    s = _state([101, 1, 2, 3, 4, 1, 0, 0, 1, 0, 0, 0, 0, 1, 0, 15, 16, 17])
    assert s.cf_op_flags() == [0, 1, 0, 0, 0, 0, 0, 0]
    assert s.ld_op_flags() == [0, 1] + [0] * 30
    assert s.hd_op_flags() == [0, 1, 0, 0]

    # mixed 2
    s = _state([101, 1, 2, 3, 4, 1, 1, 0, 1, 1, 0, 0, 0, 0, 1, 15, 16, 17])
    assert s.cf_op_flags() == [0, 0, 0, 1, 0, 0, 0, 0]
    assert s.ld_op_flags() == [0, 0, 0, 1] + [0] * 28
    assert s.hd_op_flags() == [0, 0, 1, 0]


def test_op_code_accessor():
    s = _state([101, 1, 2, 3, 4, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 15, 16, 17])
    assert s.op_code() == 127
    s = _state([101, 1, 2, 3, 4, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 15, 16, 17])
    assert s.op_code() == 97


def test_fri_prove_verify_roundtrip():
    # mirrors reference fri/mod.rs:39-60 at a reduced size
    degree = 63
    domain_size = 512
    options = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=2)

    rng = random.Random(0)
    coeffs = [rng.randrange(field.M) for _ in range(degree + 1)] + [0] * (domain_size - degree - 1)
    evaluations = polynom.eval_fft(coeffs)

    root = field.get_root_of_unity(domain_size)
    evals_dev = fj.from_ints(evaluations)
    trees, values = fri.reduce(evals_dev, root, options)
    positions = utils.compute_query_positions(trees[-1].root(), domain_size, options)
    proof = fri.build_proof(trees, values, positions)

    sampled = [evaluations[p] for p in positions]
    assert fri.verify(proof, sampled, positions, degree, options)

    # degree too low must fail
    with pytest.raises(ValueError, match="not a valid degree"):
        fri.verify(proof, sampled, positions, degree - 1, options)

    # corrupted evaluations must fail
    with pytest.raises(ValueError, match="did not match"):
        fri.verify(proof, [v + 1 for v in sampled], positions, degree, options)


def test_pow_roundtrip():
    options = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=8)
    seed = bytes(range(32))
    digest, nonce = utils.find_pow_nonce(seed, options)
    assert utils.verify_pow_nonce(seed, nonce, options) == digest
    with pytest.raises(ValueError):
        utils.verify_pow_nonce(seed, nonce + 1, options)


def test_pow_batch_matches_sequential():
    # batched grinding must find the same smallest nonce as a sequential scan
    options = ProofOptions(extension_factor=16, num_queries=10, grinding_factor=6)
    seed = b"\x07" * 32
    _, nonce = utils.find_pow_nonce(seed, options)
    from distaff_tpu.crypto.hashes import blake3
    for candidate in range(1, nonce):
        data = seed + candidate.to_bytes(8, "little") + b"\x00" * 24
        first = int.from_bytes(blake3(data)[:8], "little")
        assert first & ((1 << 6) - 1) != 0, "earlier nonce passes - batch grind wrong"


def test_security_level():
    # default options: ext 32, 50 queries, grind 20 -> 120 bits optimistic
    assert ProofOptions().security_level(True) == 120
    assert ProofOptions(extension_factor=16, num_queries=10).security_level(True) == 10


def test_query_positions_deterministic():
    options = ProofOptions(extension_factor=16, num_queries=20, grinding_factor=2)
    seed = bytes(reversed(range(32)))
    p1 = utils.compute_query_positions(seed, 4096, options)
    p2 = utils.compute_query_positions(seed, 4096, options)
    assert p1 == p2
    assert len(p1) == 20
    assert all(p % 16 != 0 for p in p1)  # trace-step positions skipped
    assert len(set(p1)) == 20


def test_syn_div_device_matches_host():
    # device synthetic divisions must agree with the host object-array
    # oracles (which themselves mirror reference polynom.rs:190-236)
    import numpy as np
    from distaff_tpu.math import field, field_jax as fj
    from distaff_tpu.stark.prover import (
        _syn_div_column, _syn_div_expanded_column, _syn_div_dev,
        _syn_div_expanded_dev)

    rng = np.random.default_rng(11)
    n = 256
    trace_len = 32
    root = field.get_root_of_unity(n)
    x_last = field.exp(field.get_root_of_unity(trace_len), trace_len - 1)

    # a polynomial divisible by (x - 1), (x - x_last) and (x^t - 1)/(x - x_last):
    # multiply a random poly by the full zero-poly (x^t - 1)
    base = [int(x) for x in rng.integers(1, 2**63, n - trace_len)]
    coeffs = np.zeros(n, dtype=object)
    for i, c in enumerate(base):
        coeffs[i + trace_len] = (coeffs[i + trace_len] + c) % field.M
        coeffs[i] = (coeffs[i] - c) % field.M

    dev = fj.from_ints(coeffs)
    for b in (1, x_last):
        host = _syn_div_column(coeffs.copy(), b)
        got = fj.to_ints(np.asarray(_syn_div_dev(dev, b)))
        assert np.array_equal(got, host), f"syn_div mismatch for b={b}"

    host = _syn_div_expanded_column(coeffs.copy(), trace_len, x_last)
    got = fj.to_ints(np.asarray(_syn_div_expanded_dev(dev, trace_len, x_last)))
    assert np.array_equal(got, host)
