"""Merkle tree tests (ported semantics from reference src/crypto/merkle.rs:316-530)."""

import numpy as np

from distaff_tpu.crypto.hashes import poseidon
from distaff_tpu.crypto.merkle import MerkleTree


def _leaves(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, 32), dtype=np.uint8)


def _hash2(a: bytes, b: bytes) -> bytes:
    return poseidon(a + b)


def test_root():
    leaves = _leaves(4)
    tree = MerkleTree(leaves, "poseidon")
    l = [leaves[i].tobytes() for i in range(4)]
    expected = _hash2(_hash2(l[0], l[1]), _hash2(l[2], l[3]))
    assert tree.root() == expected


def test_prove_verify():
    leaves = _leaves(8)
    tree = MerkleTree(leaves, "poseidon")
    for idx in [1, 2, 6]:
        proof = tree.prove(idx)
        assert MerkleTree.verify(tree.root(), idx, proof, "poseidon")
        assert not MerkleTree.verify(tree.root(), idx ^ 1, proof, "poseidon")


def test_prove_batch_structure():
    leaves = _leaves(8)
    tree = MerkleTree(leaves, "poseidon")
    l = [leaves[i].tobytes() for i in range(8)]

    proof = tree.prove_batch([1])
    assert proof.values == [l[1]]
    assert proof.nodes == [[
        l[0],
        _hash2(l[2], l[3]),
        _hash2(_hash2(l[4], l[5]), _hash2(l[6], l[7])),
    ]]
    assert proof.depth == 3

    proof = tree.prove_batch([1, 2])
    assert proof.values == [l[1], l[2]]
    assert proof.nodes == [
        [l[0], _hash2(_hash2(l[4], l[5]), _hash2(l[6], l[7]))],
        [l[3]],
    ]

    proof = tree.prove_batch(list(range(8)))
    assert proof.values == l
    assert proof.nodes == [[], [], [], []]


def test_verify_batch():
    leaves = _leaves(8)
    tree = MerkleTree(leaves, "poseidon")

    proof = tree.prove_batch([1])
    assert MerkleTree.verify_batch(tree.root(), [1], proof, "poseidon")
    assert not MerkleTree.verify_batch(tree.root(), [2], proof, "poseidon")

    proof = tree.prove_batch([1, 2])
    assert MerkleTree.verify_batch(tree.root(), [1, 2], proof, "poseidon")
    assert not MerkleTree.verify_batch(tree.root(), [1], proof, "poseidon")
    assert not MerkleTree.verify_batch(tree.root(), [1, 3], proof, "poseidon")
    assert not MerkleTree.verify_batch(tree.root(), [1, 2, 3], proof, "poseidon")

    proof = tree.prove_batch([1, 6])
    assert MerkleTree.verify_batch(tree.root(), [1, 6], proof, "poseidon")

    proof = tree.prove_batch([1, 3, 6])
    assert MerkleTree.verify_batch(tree.root(), [1, 3, 6], proof, "poseidon")

    proof = tree.prove_batch(list(range(8)))
    assert MerkleTree.verify_batch(tree.root(), list(range(8)), proof, "poseidon")


def test_blake3_tree_larger():
    leaves = _leaves(64)
    tree = MerkleTree(leaves, "blake3")
    idxs = [3, 17, 18, 40, 41, 63]
    proof = tree.prove_batch(idxs)
    assert MerkleTree.verify_batch(tree.root(), idxs, proof, "blake3")
