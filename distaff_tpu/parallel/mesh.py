"""Multi-chip sharding for the proving pipeline.

The prover's two natural parallel axes map onto a JAX device mesh:

- "r" (register axis): trace columns are independent through the LDE -
  per-register NTTs shard across devices with zero communication
  (tensor-parallel-like).
- "d" (domain axis): every pointwise stage (constraint evaluation, DEEP
  composition, FRI folds) shards across domain rows (sequence-parallel-like).

Between the two layouts XLA inserts the all-to-all resharding collective;
Merkle roots aggregate with log-depth reductions.  Intra-NTT sharding of a
single huge transform (butterfly stages with all-to-all exchange) is the
next scaling step and slots into `_ntt_stages`'s constant-geometry loop.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..math import field
from ..math import field_jax as fj


def configured_mesh():
    """The mesh the prover itself runs on, from DISTAFF_MESH_DEVICES.

    Returns None (single-device proving, the default) unless the env var
    requests N > 1 devices.  Proofs are bit-identical with and without a
    mesh - sharding only changes where the same field math executes."""
    import os

    n = int(os.environ.get("DISTAFF_MESH_DEVICES", "0"))
    if n <= 1:
        return None
    return make_mesh(n)


def make_mesh(n_devices=None, devices=None):
    """1-D device mesh over the domain/register axis.

    Prefers the default backend; falls back to the (virtual) CPU devices when
    more devices are requested than the accelerator provides."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            devices = jax.devices("cpu")
        assert n_devices is None or len(devices) >= n_devices, (
            f"requested {n_devices} devices but only {len(devices)} available"
        )
        devices = devices[: n_devices or len(devices)]
    return Mesh(np.array(devices), axis_names=("shard",))


def sharded_lde(registers_dev, extension_factor, mesh):
    """Low-degree-extend all registers with the register axis sharded.

    registers_dev: (R, N, 4) uint32; returns (R, N*ext, 4) sharded the same
    way.  R should be a multiple of the mesh size (pad with zero registers
    if needed; zero rows extend to zero rows).
    """
    n = registers_dev.shape[1]
    domain = n * extension_factor
    reg_sharding = NamedSharding(mesh, P("shard", None, None))

    @functools.partial(jax.jit, in_shardings=(reg_sharding,), out_shardings=reg_sharding)
    def _lde(regs):
        polys = jax.vmap(fj.intt)(regs)
        padded = jnp.zeros((regs.shape[0], domain, 4), dtype=jnp.uint32)
        padded = padded.at[:, :n, :].set(polys)
        return jax.vmap(fj.ntt)(padded)

    return _lde(registers_dev)


def sharded_composition(lde, weights1, weights2, z, next_z, mesh):
    """Pointwise DEEP-composition core with the domain axis sharded.

    lde: (R, D, 4) register-sharded; output: (D, 4) row-sharded.  The layout
    change from register-sharded input to row-sharded pointwise math is the
    all-to-all that rides the ICI.
    """
    n = lde.shape[1]
    n_dev = mesh.devices.size
    # shard rows when they divide evenly; otherwise let XLA pick the layout
    row_sharding = NamedSharding(mesh, P("shard", None)) if n % n_dev == 0 else None
    lde_root = field.get_root_of_unity(n)

    @functools.partial(jax.jit, out_shardings=row_sharding)
    def _compose(lde, w1, w2, z_l, nz_l):
        a1 = fj.zeros((n,))
        a2 = fj.zeros((n,))
        for i in range(lde.shape[0]):
            a1 = fj.add(a1, fj.mul(lde[i], jnp.broadcast_to(w1[i], (n, 4))))
            a2 = fj.add(a2, fj.mul(lde[i], jnp.broadcast_to(w2[i], (n, 4))))
        xs = fj.power_series(lde_root, n)
        u = fj.inv_batch(fj.sub(xs, jnp.broadcast_to(z_l, (n, 4))))
        v = fj.inv_batch(fj.sub(xs, jnp.broadcast_to(nz_l, (n, 4))))
        return fj.add(fj.mul(a1, u), fj.mul(a2, v))

    return _compose(lde, weights1, weights2, z, next_z)


def dryrun_step(n_devices, trace_registers=None):
    """One sharded proving step on tiny shapes: intra-NTT sharding with an
    all-to-all butterfly-stage exchange, register-sharded LDE NTTs, and a
    row-sharded pointwise composition (with the implicit resharding
    collective in between).  Used by __graft_entry__.dryrun_multichip."""
    from . import ntt_sharded as ns

    mesh = make_mesh(n_devices)

    # intra-NTT sharding: one transform split across all devices (requires the
    # device count to divide the transform's row factor, i.e. a power of two)
    if n_devices & (n_devices - 1) == 0:
        rng0 = np.random.default_rng(42)
        size = max(256, 16 * n_devices)
        big = fj.from_ints(rng0.integers(0, 2**63, size=(size,)).astype(object))
        ns.intt_sharded(ns.ntt_sharded(big, mesh), mesh).block_until_ready()

    n = 64
    ext = 16
    num_regs = max(16, 2 * n_devices)
    num_regs = ((num_regs + n_devices - 1) // n_devices) * n_devices

    if trace_registers is None:
        rng = np.random.default_rng(0)
        values = rng.integers(0, 2**63, size=(num_regs, n)).astype(object)
        trace_registers = fj.from_ints(values)

    lde = sharded_lde(trace_registers, ext, mesh)

    rng = np.random.default_rng(1)
    w1 = fj.from_ints(rng.integers(0, 2**63, size=(num_regs,)).astype(object))
    w2 = fj.from_ints(rng.integers(0, 2**63, size=(num_regs,)).astype(object))
    z = fj.constant(123456789)
    nz = fj.constant(987654321)

    composed = sharded_composition(lde, w1, w2, z, nz, mesh)
    composed.block_until_ready()
    return composed
