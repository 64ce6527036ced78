"""Execution-trace table with device-resident low-degree extension.

The trace arrives from the VM as host integer columns; `extend()` runs the
per-register iNTT -> zero-pad -> NTT pipeline on the TPU (the dominant cost
of proving, reference src/stark/trace/trace_table.rs:143-169 re-architected
onto the device NTT).  Row hashing for the Merkle commitment consumes the
limb representation directly - uint32 limbs in little-endian order are
exactly the u128 LE byte serialization the reference hashes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..math import field
from ..math import field_jax as fj
from ..config import (
    MAX_CONTEXT_DEPTH, MAX_LOOP_DEPTH, MAX_REGISTER_COUNT, MIN_EXTENSION_FACTOR,
)
from ..crypto.merkle import MerkleTree
from ..crypto.blake3 import blake3_batch
from ..crypto import hashes
from .trace_state import TraceState, compute_decoder_width


class TraceTable:
    def __init__(self, registers, ctx_depth, loop_depth, extension_factor):
        """`registers` is either a list of host int columns (python executor)
        or an (R, n, 2) uint64 array of little-endian u128 halves straight
        from the native VM (native.execute_u64) - the latter reaches the
        device with a pure view-cast, no per-element conversion."""
        assert extension_factor & (extension_factor - 1) == 0
        assert extension_factor >= MIN_EXTENSION_FACTOR
        assert ctx_depth <= MAX_CONTEXT_DEPTH
        assert loop_depth <= MAX_LOOP_DEPTH

        if isinstance(registers, np.ndarray):
            assert registers.ndim == 3 and registers.dtype == np.uint64
            self.registers_u64 = registers
            reg_count = registers.shape[0]
            self.trace_length = registers.shape[1]
        else:
            self.registers_u64 = None
            reg_count = len(registers)
            self.trace_length = len(registers[0])
            for r in registers:
                assert len(r) == self.trace_length

        decoder_width = compute_decoder_width(ctx_depth, loop_depth)
        assert reg_count > decoder_width, "user stack must have at least one register"
        self.stack_depth = reg_count - decoder_width
        assert reg_count < MAX_REGISTER_COUNT
        self._register_count = reg_count
        assert self.trace_length & (self.trace_length - 1) == 0

        self.registers = registers          # host int columns (unextended)
        self.ctx_depth = ctx_depth
        self.loop_depth = loop_depth
        self.extension_factor = extension_factor

        self.polys_dev = None               # (R, N, 4) device limb coefficients
        self.lde_dev = None                 # (R, N*ext, 4) device limb evaluations
        # streaming mode (huge domains): lde_dev stays None; only the
        # stride-sliced evaluation-domain view is materialized
        self.streaming = False
        self.lde_stride_dev = None          # (R, N*8, 4) rows of D_ev
        self._leaf_digests = None           # (D, 8) uint32, from the stream pass

    # geometry ------------------------------------------------------------------------------------

    def unextended_length(self):
        return self.trace_length

    def domain_size(self):
        return self.trace_length * self.extension_factor

    def register_count(self):
        return self._register_count

    def is_extended(self):
        return self.lde_dev is not None or (
            self.streaming and self.polys_dev is not None)

    # states --------------------------------------------------------------------------------------

    def get_state(self, step):
        if self.registers_u64 is not None:
            row = self.registers_u64[:, step, :]
            values = [int(row[i, 0]) | (int(row[i, 1]) << 64)
                      for i in range(row.shape[0])]
        else:
            values = [r[step] for r in self.registers]
        return TraceState.from_vec(
            self.ctx_depth, self.loop_depth, self.stack_depth, values)

    def get_last_state(self):
        return self.get_state(self.trace_length - 1)

    # low-degree extension ------------------------------------------------------------------------

    def extend(self):
        assert not self.is_extended(), "trace table has already been extended"
        n = self.trace_length
        domain = self.domain_size()

        if self.registers_u64 is not None:
            # LE u64 halves view-cast to LE u32 limbs - zero conversion work
            regs = jnp.asarray(
                np.ascontiguousarray(self.registers_u64).view(np.uint32)
                .reshape(self._register_count, n, 4))
        else:
            regs = fj.from_ints(np.array(self.registers, dtype=object))  # (R, N, 4)

        from ..parallel.mesh import configured_mesh

        r_count = regs.shape[0]
        mesh = configured_mesh()

        import os
        # streaming mode: when the full LDE wouldn't fit HBM alongside the
        # pipeline's working set, keep only the coefficient polys; the LDE is
        # recomputed register-chunk-wise inside build_merkle_tree (feeding
        # the row-hash state and the D_ev stride slice), the DEEP weighted
        # sums move to coefficient space (weighted sums commute with the
        # NTT), and query rows evaluate directly from the polys.  This is
        # what lets a 2^20-step trace (12 GB of LDE at ext 32 for ~24
        # registers) prove on one 16 GB chip - the reference instead blew
        # ~20 GB of host RAM here (reference README.md:161).
        stream_env = os.environ.get("DISTAFF_STREAM_LDE", "auto")
        lde_bytes = self._register_count * domain * 16
        budget = int(os.environ.get("DISTAFF_HBM_BUDGET_BYTES", 7 << 30))
        # under a mesh the budget is per-device: the streaming NTTs shard
        # across the mesh (intra-NTT four-step, see _stream_commit), so a
        # trace whose LDE exceeds ONE device's HBM can still prove
        budget_total = budget * (mesh.devices.size if mesh is not None else 1)
        self.streaming = (
            stream_env == "1"
            or (stream_env == "auto" and lde_bytes > budget_total))
        if self.streaming:
            # the polys are trace-sized (tiny next to the LDE) and stay
            # UNSHARDED even under a mesh: sharding happens inside the
            # per-register streaming NTTs (_stream_commit), whose domain
            # axis is what actually exceeds one device
            from ..ops import tiles
            root_n = field.get_root_of_unity(n)
            parts_p = []
            rchunk = 4
            for lo in range(0, regs.shape[0], rchunk):
                chunk = regs[lo : lo + rchunk]
                pad = rchunk - chunk.shape[0]
                if pad:
                    chunk = jnp.concatenate(
                        [chunk, jnp.zeros((pad, n, 4), dtype=jnp.uint32)])
                parts_p.append(tiles.intt_batched(chunk, root_n))
            polys = (parts_p[0] if len(parts_p) == 1
                     else jnp.concatenate(parts_p))[: self._register_count]
            self.polys_dev = polys
            return

        # multi-chip (materialized LDE): shard the register axis over the
        # mesh (the per-register NTTs need zero communication; pointwise
        # downstream stages repartition as XLA sees fit).  Zero-pad
        # registers so the axis divides the mesh - pad rows extend to zero
        # rows and are sliced off below, so proofs are bit-identical
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.devices.size
            padded_r = ((r_count + n_dev - 1) // n_dev) * n_dev
            if padded_r != r_count:
                regs = jnp.concatenate(
                    [regs, jnp.zeros((padded_r - r_count, n, 4), dtype=jnp.uint32)])
            regs = jax.device_put(regs, NamedSharding(mesh, P("shard", None, None)))

        if mesh is None and os.environ.get("DISTAFF_TILED", "1") != "0":
            polys, lde = self._extend_tiled(regs, n, domain)
        else:
            polys, lde = self._extend_vmapped(regs, n, domain)

        # slice off mesh-padding registers so every consumer (row hashing,
        # query gathers, composition weights) sees exactly the true trace
        if polys.shape[0] != self._register_count:
            polys = polys[: self._register_count]
            lde = lde[: self._register_count]
        self.polys_dev = polys
        self.lde_dev = lde

    def _extend_tiled(self, regs, n, domain):
        """LDE through the fixed-tile NTTs (ops/tiles.py): registers run in
        fixed-size groups so the transposes and the transform working set
        stay bounded and every dispatch reuses one compiled kernel set,
        whatever the trace geometry."""
        import os
        from ..ops import tiles

        rchunk = os.environ.get("DISTAFF_LDE_RCHUNK")
        if rchunk is not None:
            rchunk = int(rchunk)
        else:
            # biggest power-of-two group whose transform temporaries (~8x
            # the lane bytes for transposes + tile buffers) fit the budget;
            # power-of-two sizes keep the compiled-shape set bounded
            budget = int(os.environ.get("DISTAFF_NTT_BUDGET_BYTES", 6 << 30))
            fit = max(4, min(16, budget // (domain * 16 * 8)))
            rchunk = 1 << (fit.bit_length() - 1)
        r_count = regs.shape[0]
        root_n = field.get_root_of_unity(n)
        root_d = field.get_root_of_unity(domain)
        parts_p, parts_l = [], []
        # the batched NTT is batch-MAJOR (registers on axis 0), matching the
        # natural (R, N, 4) layout - no transposes at the kernel boundaries
        for lo in range(0, r_count, rchunk):
            chunk = regs[lo : lo + rchunk]
            pad = rchunk - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad, n, 4), dtype=jnp.uint32)])
            p = tiles.intt_batched(chunk, root_n)            # (RC, n, 4)
            padded = jnp.zeros((rchunk, domain, 4), dtype=jnp.uint32)
            padded = padded.at[:, :n].set(p)
            l = tiles.ntt_batched(padded, root_d)
            parts_p.append(p)
            parts_l.append(l)
        cat = (lambda ps: ps[0][:r_count] if len(ps) == 1
               else jnp.concatenate(ps)[:r_count])
        return cat(parts_p), cat(parts_l)

    def _extend_vmapped(self, regs, n, domain):
        """Per-shape vmapped NTT path (kept for sharded meshes, where the
        register axis carries the sharding)."""
        import os
        intt_v = jax.vmap(lambda v: fj.intt(v))
        polys = intt_v(regs)

        # the vmapped forward NTT holds ~26x the lane size in HLO temps
        # (measured: 27 lanes x 2^21 domain wanted 21.9 GB on a 16 GB chip);
        # chunk the register axis so the working set fits, padding the last
        # chunk so every dispatch reuses one compiled shape
        r_count = polys.shape[0]                # incl. any mesh padding
        per_lane = domain * 16 * 26
        budget = int(os.environ.get("DISTAFF_NTT_BUDGET_BYTES", 6 << 30))
        group = max(1, min(r_count, budget // per_lane))
        ntt_v = jax.vmap(lambda v: fj.ntt(v))
        if group >= r_count:
            padded = jnp.zeros((r_count, domain, 4), dtype=jnp.uint32)
            padded = padded.at[:, :n, :].set(polys)
            lde = ntt_v(padded)
        else:
            parts = []
            for lo in range(0, r_count, group):
                chunk = polys[lo : lo + group]
                padded = jnp.zeros((group, domain, 4), dtype=jnp.uint32)
                padded = padded.at[: chunk.shape[0], :n, :].set(chunk)
                parts.append(ntt_v(padded)[: chunk.shape[0]])
            lde = jnp.concatenate(parts, axis=0)
        return polys, lde

    def lde_rows_bytes(self):
        """Extended trace as (domain, R*16) uint8 rows for leaf hashing."""
        assert self.is_extended()
        arr = np.asarray(self.lde_dev)                   # (R, D, 4) u32
        rows = np.transpose(arr, (1, 0, 2))              # (D, R, 4)
        return np.ascontiguousarray(rows).reshape(rows.shape[0], -1).view(np.uint8)

    def _stream_commit(self):
        """One register-chunk-wise pass over the LDE: each chunk's extended
        evaluations feed (a) the incremental per-row BLAKE3 state for the
        trace commitment and (b) the D_ev stride-slice buffer the AIR and
        boundary sweeps read.  The full (R, D, 4) LDE never exists."""
        from ..config import MAX_CONSTRAINT_DEGREE
        from ..ops import tiles
        from ..ops import blake3_jax as b3

        r_count = self._register_count
        n = self.trace_length
        domain = self.domain_size()
        stride = self.extension_factor // MAX_CONSTRAINT_DEGREE
        n_ev = domain // stride
        root_d = field.get_root_of_unity(domain)
        byte_len = r_count * 16
        assert byte_len <= 2048, (
            "streaming commitment supports <= 2-chunk BLAKE3 rows "
            "(<= 128 registers = MAX_REGISTER_COUNT)")

        # under a mesh, each register's full-domain NTT is itself sharded
        # (four-step with an all-to-all, parallel/ntt_sharded.py) so the
        # streaming working set divides across devices - this is what lets a
        # trace whose LDE exceeds one device's HBM prove on a mesh
        from .prover import _mesh_for_transform

        mesh = _mesh_for_transform(domain)
        if mesh is not None:
            from ..parallel import ntt_sharded as ns
            from ..parallel import mesh_stages

        # the absorb kernel's working set is ~6x the lane bytes ((16, part)
        # message stack + 16 SSA state lanes + fori_loop double-buffering),
        # so at 2^25-row domains it runs in fixed-size domain PARTS next to
        # the NTT chain instead of one whole-domain dispatch (which OOMed a
        # 16 GB chip); parts are row-independent, so values are unchanged
        import os
        part = min(domain,
                   int(os.environ.get("DISTAFF_ABSORB_PART_ROWS", 1 << 23)))
        n_parts = domain // part
        cv_parts = [b3.absorb_begin(part) for _ in range(n_parts)]
        slice_parts = []
        staged = []  # up to 4 single-register (1, D, 4) LDEs = one 64B block
        chunk_cvs = []  # per part: finished chunk CVs (>64-register rows)

        n_blocks = (r_count + 3) // 4
        n_chunks = (n_blocks + 15) // 16  # 16 blocks = one 1024-byte chunk
        for r in range(r_count):
            # one register at a time: the eager big-n NTT chain materializes
            # ~10 full-domain intermediates before the async queue drains, so
            # the per-register chain (~10 x 512 MB at 2^25) is the HBM peak;
            # wider batches multiply it (rchunk=4 OOMed a 16 GB chip)
            padded = jnp.zeros((1, domain, 4), dtype=jnp.uint32)
            padded = padded.at[:, :n].set(self.polys_dev[r : r + 1])
            if mesh is not None:
                lde_r = ns.ntt_sharded(padded[0], mesh, root_d)  # (D, 4)
                # record the transform's matrix sharding (the final (D, 4)
                # reshape re-replicates eagerly)
                mesh_stages.RECORDED_SHARDINGS["stream_ntt"] = ns.LAST_SHARDING
            else:
                lde_r = tiles.ntt_batched(padded, root_d)[0]     # (D, 4)
            slice_parts.append(lde_r[None, ::stride])
            staged.append(lde_r)
            # fence: retire this register's NTT working set before enqueuing
            # the next (the runtime is fully async otherwise)
            np.asarray(lde_r[:1])

            if len(staged) == 4 or r == r_count - 1:
                while len(staged) < 4:  # zero-pad the final partial block
                    staged.append(jnp.zeros((domain, 4), dtype=jnp.uint32))
                bi = r // 4
                last_overall = bi == n_blocks - 1
                last_in_chunk = (bi % 16) == 15 or last_overall
                blen = byte_len - 64 * (n_blocks - 1) if last_overall else 64
                for pi in range(n_parts):
                    regs4 = [jax.lax.dynamic_slice_in_dim(
                        s, pi * part, part, axis=0) for s in staged]
                    cv_parts[pi] = b3.absorb_block(
                        cv_parts[pi], regs4[0], regs4[1], regs4[2], regs4[3],
                        (bi % 16) == 0, last_in_chunk,
                        last_overall and n_chunks == 1, blen, bi // 16)
                staged = []
                if last_in_chunk and n_chunks > 1:
                    chunk_cvs.append(list(cv_parts))
                    if not last_overall:
                        cv_parts = [b3.absorb_begin(part)
                                    for _ in range(n_parts)]
                np.asarray(cv_parts[-1][0, :1])

        self.lde_stride_dev = jnp.concatenate(slice_parts)
        if n_chunks == 1:
            digests = [b3.absorb_finish(cv) for cv in cv_parts]
        else:
            digests = [b3.parent_root(c0, c1).T
                       for c0, c1 in zip(chunk_cvs[0], chunk_cvs[1])]
        self._leaf_digests = (digests[0] if n_parts == 1
                              else jnp.concatenate(digests))

    def build_merkle_tree(self, hash_name):
        import os
        if self.streaming:
            assert hash_name == "blake3", (
                "streaming commitment is blake3-only; set "
                "DISTAFF_STREAM_LDE=0 for other hash functions")
            from ..crypto.merkle_dev import make_device_tree
            if self._leaf_digests is None:
                self._stream_commit()
            return make_device_tree(self._leaf_digests)
        row_bytes = self.register_count() * 16
        if (os.environ.get("DISTAFF_DEVICE_HASH", "1") != "0"
                and hash_name == "blake3" and row_bytes <= 2048):
            # leaf digests AND every tree level are hashed on the device
            # (loop-formulated BLAKE3 compression); only the 32-byte root and
            # the eventual query openings cross the (slow) host link.
            # DISTAFF_DEVICE_HASH=0 forces host hashing.
            from ..ops.blake3_jax import hash_trace_rows_dev
            from ..crypto.merkle_dev import make_device_tree
            leaves = hash_trace_rows_dev(self.lde_dev)
            if leaves is not None:
                return make_device_tree(leaves)
        rows = self.lde_rows_bytes()
        if hash_name == "blake3":
            leaves = blake3_batch(rows)
        else:
            hash_fn = hashes.HASH_FUNCTIONS[hash_name]
            leaves = np.array(
                [np.frombuffer(hash_fn(rows[i].tobytes()), dtype=np.uint8)
                 for i in range(rows.shape[0])]
            )
        return MerkleTree(leaves, hash_name)

    def get_register_values_at_async(self, positions, batch=None):
        """Enqueue the extended-trace rows at the given positions; returns a
        zero-arg closure producing the host-int rows.  Device work starts
        immediately and the results ride the caller's TransferBatch (or a
        direct copy), so step 9 overlaps these with the FRI proof
        assembly."""
        if self.streaming:
            # no LDE to gather from: evaluate every register poly directly
            # at x = g^p for each queried position (identical values - the
            # LDE rows ARE those evaluations), all positions in one batched
            # multi-point sweep
            from .prover import _poly_eval_rows_multi_async
            root = field.get_root_of_unity(self.domain_size())
            return _poly_eval_rows_multi_async(
                self.polys_dev,
                [field.exp(root, int(p)) for p in positions], batch)
        from ..ops.gather import gather_rows_dev
        rows, k = gather_rows_dev(
            self.lde_dev, list(positions), axis=1)   # (R, Q', 4) device
        if batch is not None:
            ref = batch.add(rows)
            fetch = lambda: batch.get(ref)  # noqa: E731
        else:
            if hasattr(rows, "copy_to_host_async"):
                rows.copy_to_host_async()
            fetch = lambda: np.asarray(rows)  # noqa: E731

        def result():
            ints = fj.to_ints(fetch()[:, :k])        # (R, Q) object
            return [[int(ints[r][q]) for r in range(ints.shape[0])]
                    for q in range(ints.shape[1])]

        return result

    def get_register_values_at(self, positions):
        """Rows of the extended trace at the given positions (host ints):
        one bucketed gather + transfer instead of a round-trip per position."""
        return self.get_register_values_at_async(positions)()

    def eval_polys_at(self, z):
        """T_i(z) for all registers (device dot with the power series of z)."""
        assert self.is_extended()
        powers = fj.power_series_dev(fj.constant(z), self.trace_length)
        values = jax.vmap(lambda p: fj.dot(p, powers))(self.polys_dev)
        return [int(v) for v in fj.to_ints(values)]
