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

import os

import numpy as np
import jax
import jax.numpy as jnp

from .merkle import BatchMerkleProof, build_merkle_nodes
from ..ops.blake3_jax import hash_rows_u32

# leaves per fixed-shape device subtree; trees larger than this split into
# SUBTREE-leaf device subtrees plus a host-hashed cap so the device kernel
# compiles once for every tree size (see ops/tiles.py module docstring)
SUBTREE = int(os.environ.get("DISTAFF_MERKLE_SUBTREE", 1 << 12))
# subtrees per dispatch: a 2^25-leaf tree has 8192 subtrees, and at the
# former group of 8 the build issued ~1024 tiny (1 MB) dispatches - ~3 s of
# pure dispatch overhead over the tunnel at the 2^20 north star
_SGROUP = int(os.environ.get("DISTAFF_MERKLE_SGROUP", 64))


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


@jax.jit
def _build_subtree_nodes(leaves_u32):
    """(_SGROUP, SUBTREE, 8) leaf groups -> (_SGROUP, SUBTREE, 8) local flat
    node arrays (row 0 unused, subtree root at local index 1).  Fixed shape:
    compiles once for every tree size and proof geometry."""
    sg, size = leaves_u32.shape[0], leaves_u32.shape[1]
    levels = []
    cur = leaves_u32
    while size > 1:
        cur = hash_rows_u32(
            cur.reshape(sg * size // 2, 16), 64).reshape(sg, size // 2, 8)
        levels.append(cur)
        size //= 2
    return jnp.concatenate(
        [jnp.zeros((sg, 1, 8), dtype=jnp.uint32)] + levels[::-1], axis=1)


def make_device_tree(leaves_u32):
    """Factory: fixed-shape tiled tree for large leaf counts, single-dispatch
    tree for small ones (whose compiles are cheap)."""
    if leaves_u32.shape[0] > SUBTREE:
        return TiledDeviceMerkleTree(leaves_u32)
    return DeviceMerkleTree(leaves_u32)


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
        return self._nodes_from_opaque(
            node_indexes, self._gather_nodes_dev(node_indexes)())

    def _gather_leaves(self, leaf_indexes):
        if not leaf_indexes:
            return []
        rows = np.ascontiguousarray(self._gather_leaves_dev(leaf_indexes)())
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

    def prove_batch_async(self, indexes, batch=None):
        """Same node-dedup walk as MerkleTree.prove_batch (reference
        merkle.rs:64-124), but run over indices only; the 32-byte node
        values come from two batched device gathers.  With `batch` (an
        ops.hostsync.TransferBatch) the gathers join the caller's single
        bulk device->host fetch - the tunnel has no effective async copy,
        so per-tree fetches cost a blocking ~20 ms round trip each and
        step 9 opens ten trees; without it, copies start here
        (copy_to_host_async, best-effort) and land in `.result()`."""
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

        # internal layers: same walk as the host tree, recording which flat
        # node indices get appended where
        depth = n.bit_length() - 1
        node_slots = []                               # (norm_i, flat node index)
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

        leaf_dev = self._gather_leaves_dev(leaf_fetch, batch)
        node_dev = self._gather_nodes_dev([ni for _, ni in node_slots], batch)
        return _PendingBatchProof(
            self, index_map, leaf_plan, node_slots, leaf_dev, node_dev, depth)

    def prove_batch(self, indexes) -> BatchMerkleProof:
        return self.prove_batch_async(indexes).result()

    @staticmethod
    def _defer(rows_k, batch):
        """(device rows, true count) -> zero-arg closure producing the
        TRIMMED host array, either through the caller's TransferBatch or a
        direct (best-effort async) copy.  The gather stays on device here -
        no synchronization until the closure runs."""
        rows, k = rows_k
        if batch is not None:
            ref = batch.add(rows)
            return lambda: batch.get(ref)[:k]
        if hasattr(rows, "copy_to_host_async"):
            rows.copy_to_host_async()
        return lambda: np.asarray(rows)[:k]

    def _gather_leaves_dev(self, leaf_indexes, batch=None):
        if not leaf_indexes:
            return lambda: None
        from ..ops.gather import gather_rows_dev
        return self._defer(gather_rows_dev(self.values, leaf_indexes), batch)

    def _gather_nodes_dev(self, node_indexes, batch=None):
        """Enqueue the device gather of internal nodes; returns a closure
        whose host result _nodes_from_opaque consumes."""
        if not node_indexes:
            return lambda: None
        from ..ops.gather import gather_rows_dev
        return self._defer(
            gather_rows_dev(self.flat_nodes, node_indexes), batch)

    def _nodes_from_opaque(self, node_indexes, host_rows):
        if host_rows is None:
            return []
        rows = np.ascontiguousarray(host_rows)
        rows = rows.view(np.uint8).reshape(len(node_indexes), 32)
        return [rows[k].tobytes() for k in range(len(node_indexes))]


class _PendingBatchProof:
    """A batch Merkle opening whose device->host copies are in flight."""

    def __init__(self, tree, index_map, leaf_plan, node_slots,
                 leaf_dev, node_dev, depth):
        self.tree = tree
        self.index_map = index_map
        self.leaf_plan = leaf_plan
        self.node_slots = node_slots
        self.leaf_dev = leaf_dev
        self.node_dev = node_dev
        self.depth = depth

    def result(self) -> BatchMerkleProof:
        leaf_vals = []
        leaf_host = self.leaf_dev()
        if leaf_host is not None:
            rows = np.ascontiguousarray(leaf_host)
            rows = rows.view(np.uint8).reshape(-1, 32)
            leaf_vals = [rows[k].tobytes() for k in range(rows.shape[0])]

        values = [b""] * len(self.index_map)
        nodes = []
        for i, (i1, i2) in enumerate(self.leaf_plan):
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

        fetched = self.tree._nodes_from_opaque(
            [ni for _, ni in self.node_slots], self.node_dev())
        for (i, _), value in zip(self.node_slots, fetched):
            nodes[i].append(value)
        return BatchMerkleProof(values, nodes, self.depth)


class TiledDeviceMerkleTree(DeviceMerkleTree):
    """DeviceMerkleTree for N > SUBTREE leaves built from fixed-shape device
    kernels: the bottom log2(SUBTREE) levels are hashed as SUBTREE-leaf
    subtrees (one compiled kernel for every tree size), and the cap tree over
    the subtree roots (<= N/SUBTREE 32-byte digests, a few hundred KB) is
    hashed on the host by the native BLAKE3 Merkle builder.

    Node *values* are identical to a monolithic build, so roots and batch
    proofs are byte-identical; only where each node is stored differs."""

    def __init__(self, leaves_u32):
        n = leaves_u32.shape[0]
        assert n > SUBTREE and n & (n - 1) == 0
        self.n = n
        self.values = leaves_u32
        n_sub = n // SUBTREE
        grouped = leaves_u32.reshape(n_sub, SUBTREE, 8)

        # multi-chip: the independent subtree builds shard across the mesh
        from ..parallel.mesh import configured_mesh
        mesh = configured_mesh()
        sub_nodes = None
        if mesh is not None:
            from ..parallel.mesh_stages import subtree_nodes_sharded
            sub_nodes = subtree_nodes_sharded(grouped, mesh)
        if sub_nodes is None:
            parts = []
            for lo in range(0, n_sub, _SGROUP):
                chunk = grouped[lo : lo + _SGROUP]
                pad = _SGROUP - chunk.shape[0]
                if pad:
                    chunk = jnp.concatenate(
                        [chunk, jnp.zeros((pad, SUBTREE, 8), dtype=jnp.uint32)])
                parts.append(_build_subtree_nodes(chunk))
            sub_nodes = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        # (n_sub, SUBTREE, 8), local flat layout per subtree
        self.sub_nodes = sub_nodes[:n_sub]

        roots = np.ascontiguousarray(
            np.asarray(self.sub_nodes[:, 1, :])).view(np.uint8).reshape(n_sub, 32)
        # host cap: internal nodes of the tree whose leaves are the subtree
        # roots; cap flat index i == global flat index i (levels above the
        # subtree roots)
        self.cap_levels = n_sub.bit_length() - 1
        # (n_sub, 32) u8: internal nodes only, flat indexes [1, n_sub); nodes
        # at global flat index >= n_sub are subtree-root-level and live in the
        # device subtrees, never in this cap array
        self.cap_nodes = build_merkle_nodes(roots, "blake3")
        self._root = self.cap_nodes[1].tobytes()

    def _node_split(self, node_indexes):
        """Split flat node indexes into host cap values and device subtree
        gather coordinates: cap internal nodes occupy global flat indexes
        [1, n_sub); deeper nodes live in the device subtrees."""
        n_sub = self.n // SUBTREE
        out = [None] * len(node_indexes)
        dev_flat = []
        dev_slots = []
        for slot, i in enumerate(node_indexes):
            if i < n_sub:
                out[slot] = self.cap_nodes[i].tobytes()
            else:
                k = i.bit_length() - 1          # global level
                p = i - (1 << k)                # position within level
                kl = k - self.cap_levels        # level within subtree (>= 0)
                j = p >> kl                     # subtree index
                local = (1 << kl) + (p & ((1 << kl) - 1))
                dev_flat.append(j * SUBTREE + local)
                dev_slots.append(slot)
        return out, dev_flat, dev_slots

    def _gather_nodes_dev(self, node_indexes, batch=None):
        if not node_indexes:
            return lambda: None
        out, dev_flat, dev_slots = self._node_split(node_indexes)
        if not dev_flat:
            return lambda: (out, dev_slots, None)
        from ..ops.gather import gather_rows_dev
        n_sub = self.n // SUBTREE
        flat = self.sub_nodes.reshape(n_sub * SUBTREE, 8)
        rows = self._defer(gather_rows_dev(flat, dev_flat), batch)
        return lambda: (out, dev_slots, rows())

    def _nodes_from_opaque(self, node_indexes, opaque):
        if opaque is None:
            return []
        out, dev_slots, rows = opaque
        if rows is not None:
            host = np.ascontiguousarray(rows)
            host = host.view(np.uint8).reshape(len(dev_slots), 32)
            for slot, k in zip(dev_slots, range(len(dev_slots))):
                out[slot] = host[k].tobytes()
        return out
