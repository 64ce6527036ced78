"""DeviceMerkleTree must match the host MerkleTree bit-for-bit: root,
single openings, and batch openings (node order included) - batch proofs are
serialized into the STARK proof, so any divergence breaks verification."""

import numpy as np
import jax.numpy as jnp
import pytest

from distaff_tpu.crypto.merkle import MerkleTree
from distaff_tpu.crypto.merkle_dev import DeviceMerkleTree


def _random_leaves(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, 32)).astype(np.uint8)


def _device_tree(leaves_u8):
    leaves_u32 = jnp.asarray(
        np.ascontiguousarray(leaves_u8).view(np.uint32).reshape(leaves_u8.shape[0], 8))
    return DeviceMerkleTree(leaves_u32)


@pytest.mark.parametrize("n", [2, 8, 64, 256])
def test_root_matches_host(n):
    leaves = _random_leaves(n)
    host = MerkleTree(leaves, "blake3")
    dev = _device_tree(leaves)
    assert dev.root() == host.root()


def test_single_proof_matches_and_verifies():
    leaves = _random_leaves(128)
    host = MerkleTree(leaves, "blake3")
    dev = _device_tree(leaves)
    for index in (0, 1, 37, 127):
        p_host = host.prove(index)
        p_dev = dev.prove(index)
        assert p_dev == p_host
        assert MerkleTree.verify(dev.root(), index, p_dev, "blake3")


@pytest.mark.parametrize("indexes", [
    [2], [0, 1], [3, 8, 9, 60], [4, 5, 6, 7], [1, 63, 64, 65, 255],
])
def test_batch_proof_matches_host(indexes):
    leaves = _random_leaves(256, seed=11)
    host = MerkleTree(leaves, "blake3")
    dev = _device_tree(leaves)
    p_host = host.prove_batch(indexes)
    p_dev = dev.prove_batch(indexes)
    assert p_dev.values == p_host.values
    assert p_dev.nodes == p_host.nodes
    assert p_dev.depth == p_host.depth
    assert MerkleTree.verify_batch(dev.root(), indexes, p_dev, "blake3")


# tiled (subtree + host cap) trees --------------------------------------------------------------

def _tiled_tree(leaves_u8):
    from distaff_tpu.crypto.merkle_dev import TiledDeviceMerkleTree
    leaves_u32 = jnp.asarray(
        np.ascontiguousarray(leaves_u8).view(np.uint32).reshape(leaves_u8.shape[0], 8))
    return TiledDeviceMerkleTree(leaves_u32)


@pytest.mark.parametrize("n", [128, 512])
def test_tiled_root_matches_host(n):
    from distaff_tpu.crypto import merkle_dev
    assert n > merkle_dev.SUBTREE, "conftest must set a small DISTAFF_MERKLE_SUBTREE"
    leaves = _random_leaves(n, seed=n)
    assert _tiled_tree(leaves).root() == MerkleTree(leaves, "blake3").root()


@pytest.mark.parametrize("indexes", [[0], [3, 200, 201], [5, 64, 65, 127, 300, 511]])
def test_tiled_batch_proof_matches_host(indexes):
    n = 512
    leaves = _random_leaves(n, seed=11)
    host = MerkleTree(leaves, "blake3")
    dev = _tiled_tree(leaves)
    hp = host.prove_batch(indexes)
    dp = dev.prove_batch(indexes)
    assert dp == hp
    assert MerkleTree.verify_batch(dev.root(), indexes, dp, "blake3")


def test_tiled_single_proof_matches_host():
    n = 256
    leaves = _random_leaves(n, seed=13)
    host = MerkleTree(leaves, "blake3")
    dev = _tiled_tree(leaves)
    for idx in (0, 1, 100, 255):
        assert dev.prove(idx) == host.prove(idx)
        assert MerkleTree.verify(dev.root(), idx, dev.prove(idx), "blake3")
