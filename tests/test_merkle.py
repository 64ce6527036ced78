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


# ------------------------------------------------------------------------------------------------
# reference-vendored leaf vectors (reference src/crypto/merkle.rs:321-339):
# with identical input bytes, every root / proof / batch node list below is a
# golden value the Rust implementation also produces
# ------------------------------------------------------------------------------------------------

LEAVES4 = [bytes(v) for v in [
    [166, 168, 47, 140, 153, 86, 156, 86, 226, 229, 149, 76, 70, 132, 209, 109,
     166, 193, 113, 197, 42, 116, 170, 144, 74, 104, 29, 110, 220, 49, 224, 123],
    [243, 57, 40, 140, 185, 79, 188, 229, 232, 117, 143, 118, 235, 229, 73, 251,
     163, 246, 151, 170, 14, 243, 255, 127, 175, 230, 94, 227, 214, 5, 89, 105],
    [11, 33, 220, 93, 26, 67, 166, 154, 93, 7, 115, 130, 70, 13, 166, 45,
     120, 233, 175, 86, 144, 110, 253, 250, 67, 108, 214, 115, 24, 132, 45, 234],
    [47, 173, 224, 232, 30, 46, 197, 186, 215, 15, 134, 211, 73, 14, 34, 216,
     6, 11, 217, 150, 90, 242, 8, 31, 73, 85, 150, 254, 229, 244, 23, 231],
]]

LEAVES8 = [bytes(v) for v in [
    [115, 29, 176, 48, 97, 18, 34, 142, 51, 18, 164, 235, 236, 96, 113, 132,
     189, 26, 70, 93, 101, 143, 142, 52, 252, 33, 80, 157, 194, 52, 209, 129],
    [52, 46, 37, 214, 24, 248, 121, 199, 229, 25, 171, 67, 65, 37, 98, 142,
     182, 72, 202, 42, 223, 160, 136, 60, 38, 255, 222, 82, 26, 27, 130, 203],
    [130, 43, 231, 0, 59, 228, 152, 140, 18, 33, 87, 27, 49, 190, 44, 82,
     188, 155, 163, 108, 166, 198, 106, 143, 83, 167, 201, 152, 106, 176, 242, 119],
    [207, 158, 56, 143, 28, 146, 238, 47, 169, 32, 166, 97, 163, 238, 171, 243,
     33, 209, 120, 219, 17, 182, 96, 136, 13, 90, 6, 27, 247, 242, 49, 111],
    [179, 64, 123, 119, 226, 139, 161, 127, 36, 251, 218, 88, 20, 217, 212, 85,
     112, 85, 185, 193, 230, 181, 4, 22, 54, 219, 135, 98, 235, 180, 182, 7],
    [101, 240, 19, 44, 43, 213, 31, 138, 39, 26, 82, 147, 255, 96, 234, 51,
     105, 6, 233, 144, 255, 187, 242, 3, 157, 246, 55, 175, 98, 121, 92, 175],
    [25, 96, 149, 179, 94, 8, 170, 214, 169, 135, 12, 212, 224, 157, 182, 127,
     233, 93, 151, 214, 36, 183, 156, 212, 233, 152, 125, 244, 146, 161, 75, 128],
    [247, 43, 130, 141, 234, 172, 61, 187, 109, 31, 56, 30, 14, 232, 92, 158,
     48, 161, 108, 234, 170, 180, 233, 77, 200, 248, 45, 152, 125, 11, 1, 171],
]]


def _np_leaves(rows):
    return np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(len(rows), 32)


def test_reference_new_tree():
    # reference merkle.rs:341-363
    tree = MerkleTree(_np_leaves(LEAVES4), "poseidon")
    expected = _hash2(_hash2(LEAVES4[0], LEAVES4[1]), _hash2(LEAVES4[2], LEAVES4[3]))
    assert tree.root() == expected

    l = LEAVES8
    tree = MerkleTree(_np_leaves(l), "poseidon")
    expected = _hash2(
        _hash2(_hash2(l[0], l[1]), _hash2(l[2], l[3])),
        _hash2(_hash2(l[4], l[5]), _hash2(l[6], l[7])))
    assert tree.root() == expected


def test_reference_prove():
    # reference merkle.rs:365-403
    l4 = LEAVES4
    tree = MerkleTree(_np_leaves(l4), "poseidon")
    assert tree.prove(1) == [l4[1], l4[0], _hash2(l4[2], l4[3])]
    assert tree.prove(2) == [l4[2], l4[3], _hash2(l4[0], l4[1])]

    l = LEAVES8
    tree = MerkleTree(_np_leaves(l), "poseidon")
    assert tree.prove(1) == [
        l[1], l[0], _hash2(l[2], l[3]),
        _hash2(_hash2(l[4], l[5]), _hash2(l[6], l[7]))]
    assert tree.prove(6) == [
        l[6], l[7], _hash2(l[4], l[5]),
        _hash2(_hash2(l[0], l[1]), _hash2(l[2], l[3]))]


def test_reference_prove_batch():
    # reference merkle.rs:427-487 - exact deduped node lists
    l = LEAVES8
    tree = MerkleTree(_np_leaves(l), "poseidon")

    proof = tree.prove_batch([1])
    assert proof.values == [l[1]]
    assert proof.nodes == [[
        l[0], _hash2(l[2], l[3]),
        _hash2(_hash2(l[4], l[5]), _hash2(l[6], l[7]))]]
    assert proof.depth == 3

    proof = tree.prove_batch([1, 2])
    assert proof.values == [l[1], l[2]]
    assert proof.nodes == [
        [l[0], _hash2(_hash2(l[4], l[5]), _hash2(l[6], l[7]))],
        [l[3]],
    ]
    assert proof.depth == 3

    # 2 indexes on opposite sides
    proof = tree.prove_batch([1, 6])
    assert proof.values == [l[1], l[6]]
    assert proof.nodes == [
        [l[0], _hash2(l[2], l[3])],
        [l[7], _hash2(l[4], l[5])],
    ]
    assert proof.depth == 3

    proof = tree.prove_batch(list(range(8)))
    assert proof.values == list(l)
    assert proof.nodes == [[], [], [], []]
    assert proof.depth == 3


def test_blake3_tree_larger():
    leaves = _leaves(64)
    tree = MerkleTree(leaves, "blake3")
    idxs = [3, 17, 18, 40, 41, 63]
    proof = tree.prove_batch(idxs)
    assert MerkleTree.verify_batch(tree.root(), idxs, proof, "blake3")
