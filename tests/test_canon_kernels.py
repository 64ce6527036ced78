"""Round-5 canonical-kernel properties (ops/tiles.py).

1. inv_batch_scan (Montgomery-trick batched inversion) against inv_batch /
   the host oracle, including zeros and multi-dimensional shapes - it is
   soundness-relevant in the DEEP composition but only runs on accelerators
   in production, so CI must pin it explicitly.
2. suffix_sums (fixed-tile suffix scan) against a host oracle across
   tile-boundary sizes.
3. The executable-sharing invariant the bench ladder relies on: after
   warm_kernels() and a proof at one trace geometry, proving a LARGER
   geometry compiles no new canonical transform kernels (the round-4
   per-(batch, n) whole-transform jits broke exactly this, costing ~300 s
   of executable loads per fresh bench rung).
"""

import random

import numpy as np
import pytest

import distaff_tpu
from distaff_tpu import assembly, ProgramInputs, ProofOptions
from distaff_tpu.math import field
from distaff_tpu.math import field_jax as fj
from distaff_tpu.ops import tiles


def test_inv_batch_scan_matches_inv_batch():
    rng = random.Random(11)
    vals = [0, 1, field.M - 1, 2] + [rng.randrange(field.M) for _ in range(60)]
    vals[7] = 0          # zero in the middle of the batch
    vals[-1] = 0         # zero at the end
    a = fj.from_ints(np.array(vals, dtype=object))
    got = list(fj.to_ints(fj.inv_batch_scan(a)))
    want = [field.inv(v) for v in vals]
    assert got == want
    assert got == list(fj.to_ints(fj.inv_batch(a)))

    # multi-dimensional shape: flattening must preserve per-element results
    b = fj.from_ints(np.array(
        [[rng.randrange(field.M) for _ in range(5)] for _ in range(4)],
        dtype=object))
    got2 = fj.to_ints(fj.inv_batch_scan(b))
    want2 = fj.to_ints(fj.inv_batch(b))
    assert (got2 == want2).all()


@pytest.mark.parametrize(
    "n", [1, 3, tiles.TILE, tiles.TILE + 1, 3 * tiles.TILE + 7])
def test_suffix_sums_matches_host(n):
    rng = random.Random(n)
    vals = [rng.randrange(field.M) for _ in range(n)]
    a = fj.from_ints(np.array(vals, dtype=object))
    got = list(fj.to_ints(np.asarray(tiles.suffix_sums(a))))
    want = []
    acc = 0
    for v in reversed(vals):
        acc = (acc + v) % field.M
        want.append(acc)
    want.reverse()
    assert got == want


def _prove(log2_trace):
    n_iter = (1 << log2_trace) * 3 // 64
    program = assembly.compile(
        f"begin repeat.{n_iter} swap dup.2 drop add end end")
    inputs = ProgramInputs.from_public([1, 0])
    options = ProofOptions(extension_factor=16, num_queries=10,
                           grinding_factor=2)
    outputs, proof = distaff_tpu.execute(program, inputs, 1, options)
    assert proof.trace_length() == 1 << log2_trace
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs, proof)


@pytest.mark.heavy  # two full CPU proofs (~5 min); the invariant it pins
                    # is bench-critical but geometry-independent, so the
                    # full tier covers it
def test_no_new_transform_kernels_across_geometries():
    # warm the canonical set, prove one geometry, then assert a 4x-larger
    # geometry (fresh interpolation/LDE/composition transform sizes) adds
    # ZERO canonical-kernel compiles
    tiles.warm_kernels()
    _prove(9)
    tracked = [tiles._pease_tile, tiles._pease_tile2,
               tiles._twiddle_rows_tile, tiles._suf_tile]
    before = [f._cache_size() for f in tracked]
    _prove(11)
    after = [f._cache_size() for f in tracked]
    assert after == before, (
        "proving a new trace geometry compiled fresh canonical kernels: "
        f"{[(f.__name__, b, a) for f, b, a in zip(tracked, before, after)]}")
