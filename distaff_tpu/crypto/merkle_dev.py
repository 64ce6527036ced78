"""Device-resident Merkle trees: all levels hashed on the TPU, with only
32-byte roots and the queried openings ever crossing the host link.

Motivation: the host link of a tunneled TPU runs device->host at ~15 MB/s
(measured), so transferring an 8M-leaf digest array (256 MB) to build the
tree on host costs ~18 s while hashing every level on device costs ~0.4 s.
Semantics (layout, batch-proof node order) are identical to
crypto.merkle.MerkleTree / the reference (reference src/crypto/merkle.rs):
internal nodes form a flat conceptual array with the root at index 1 and
node i's children at 2i, 2i+1; here each level is kept as a separate
(n_k, 8) uint32 device array instead.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .merkle import BatchMerkleProof
from ..ops.blake3_jax import hash_rows_u32


@jax.jit
def _build_flat_nodes(leaves_u32):
    """All internal levels hashed in ONE device dispatch, returned as the
    flat reference-order node array: index 0 unused, root at 1, node i's
    children at 2i / 2i+1."""
    n = leaves_u32.shape[0]
    levels = []
    cur = leaves_u32
    size = n
    while size > 1:
        cur = hash_rows_u32(cur.reshape(size // 2, 16), 64)
        levels.append(cur)
        size //= 2
    return jnp.concatenate([jnp.zeros((1, 8), dtype=jnp.uint32)] + levels[::-1])


class DeviceMerkleTree:
    """blake3 Merkle tree with leaves and internal levels on the device.

    `leaves_u32`: (N, 8) uint32 digest/value rows (32 bytes each, the same
    little-endian u32 word layout the host trees use).
    """

    hash_name = "blake3"

    def __init__(self, leaves_u32):
        n = leaves_u32.shape[0]
        assert n >= 2 and n & (n - 1) == 0, "number of leaves must be a power of 2, >= 2"
        self.n = n
        self.values = leaves_u32                      # (N, 8) u32, device
        # all levels in reference node order (root at index 1, node i's
        # children at 2i/2i+1), hashed in one device dispatch; one gather +
        # one transfer then serves a whole batch opening
        self.flat_nodes = _build_flat_nodes(leaves_u32)
        self._root = np.ascontiguousarray(np.asarray(self.flat_nodes[1])).tobytes()

    # interface parity with crypto.merkle.MerkleTree -----------------------------------------------

    def root(self) -> bytes:
        return self._root

    def leaves(self):
        return self.values

    def leaf_count(self):
        return self.n

    def _gather_nodes(self, node_indexes):
        """Fetch internal nodes by flat index in one transfer -> list[bytes]."""
        if not node_indexes:
            return []
        from ..ops.gather import gather_rows
        rows = np.ascontiguousarray(gather_rows(self.flat_nodes, node_indexes))
        rows = rows.view(np.uint8).reshape(len(node_indexes), 32)
        return [rows[k].tobytes() for k in range(len(node_indexes))]

    def _gather_leaves(self, leaf_indexes):
        if not leaf_indexes:
            return []
        from ..ops.gather import gather_rows
        rows = np.ascontiguousarray(gather_rows(self.values, leaf_indexes))
        rows = rows.view(np.uint8).reshape(len(leaf_indexes), 32)
        return [rows[k].tobytes() for k in range(len(leaf_indexes))]

    def prove(self, index):
        leaf_vals = self._gather_leaves([index, index ^ 1])
        proof = [leaf_vals[0], leaf_vals[1]]
        node_indexes = []
        ni = (index + self.n) >> 1
        while ni > 1:
            node_indexes.append(ni ^ 1)
            ni >>= 1
        proof.extend(self._gather_nodes(node_indexes))
        return proof

    def prove_batch(self, indexes) -> BatchMerkleProof:
        """Same node-dedup walk as MerkleTree.prove_batch (reference
        merkle.rs:64-124), but run over indices only; the actual 32-byte
        node values are fetched from the device in two batched gathers."""
        from .merkle import _map_indexes, _normalize_indexes

        n = self.n
        index_map = _map_indexes(indexes, n - 1)
        norm_indexes = _normalize_indexes(indexes)

        # leaf layer: figure out which leaves are values vs sibling nodes
        leaf_fetch = []                               # leaf indexes to pull
        leaf_plan = []                                # per norm index: (i1, i2)
        next_indexes = []
        for index in norm_indexes:
            leaf_fetch.extend((index, index + 1))
            leaf_plan.append((index_map.get(index), index_map.get(index + 1)))
            next_indexes.append((index + n) >> 1)
        leaf_vals = self._gather_leaves(leaf_fetch)

        values = [b""] * len(index_map)
        nodes = []
        node_slots = []                               # (norm_i, flat node index)
        for i, (i1, i2) in enumerate(leaf_plan):
            v1, v2 = leaf_vals[2 * i], leaf_vals[2 * i + 1]
            if i1 is not None:
                if i2 is not None:
                    values[i1] = v1
                    values[i2] = v2
                    nodes.append([])
                else:
                    values[i1] = v1
                    nodes.append([v2])
            else:
                values[i2] = v2
                nodes.append([v1])

        # internal layers: same walk as the host tree, recording which flat
        # node indices get appended where; values fetched in one transfer
        depth = n.bit_length() - 1
        walk = next_indexes
        for _ in range(1, depth):
            new_walk = []
            i = 0
            while i < len(walk):
                sibling_index = walk[i] ^ 1
                if i + 1 < len(walk) and walk[i + 1] == sibling_index:
                    i += 1
                else:
                    node_slots.append((i, sibling_index))
                new_walk.append(sibling_index >> 1)
                i += 1
            walk = new_walk

        fetched = self._gather_nodes([ni for _, ni in node_slots])
        for (i, _), value in zip(node_slots, fetched):
            nodes[i].append(value)

        return BatchMerkleProof(values, nodes, depth)
