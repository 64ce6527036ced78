"""Distributed NTT: the four-step Cooley-Tukey decomposition over a mesh.

For n = n1 * n2 with the i1 axis sharded across devices:

    X[k2 + n2*k1] = NTT_n1 over i1 ( w^(i1*k2) * NTT_n2 over i2 ( x[i1 + n1*i2] ) )

- step 1: length-n2 NTTs along the local rows       (no communication)
- step 2: twiddle multiply w^(i1*k2)                (no communication)
- step 3: distributed transpose                      (one all-to-all on ICI)
- step 4: length-n1 NTTs along the now-local axis   (no communication)

The result matrix (k1, k2) flattened row-major is exactly the natural-order
transform, so a single all-to-all replaces the reference's shared-memory
recursion (reference src/math/fft.rs:29-38) at multi-chip scale.  The local
transforms reuse the constant-geometry single-chip NTT.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# jax.shard_map is the stable API (>= 0.4.35); the experimental module is
# deprecated and will disappear in a future release
if hasattr(jax, "shard_map"):
    shard_map = jax.shard_map
else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..math import field
from ..math import field_jax as fj


def _split(n):
    """n = n1 * n2 with n1 <= n2, both powers of two."""
    log = n.bit_length() - 1
    l1 = log // 2
    return 1 << l1, 1 << (log - l1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _ntt_sharded_impl(matrix, w_full, n1, n2, root_int, mesh):
    n = n1 * n2
    tw2 = fj.power_series(pow(root_int, n1, field.M), max(n2 // 2, 1))
    tw1 = fj.power_series(pow(root_int, n2, field.M), max(n1 // 2, 1))
    rev2 = jnp.asarray(fj._bitrev_indices(n2))
    rev1 = jnp.asarray(fj._bitrev_indices(n1))
    n_dev = mesh.devices.size

    def local(block, w_rep):
        # block: (n1/D, n2, 4); w_rep: (n, 4) replicated root powers
        # step 1: row NTTs of length n2
        a = jax.vmap(lambda v: fj._ntt_stages(v, tw2)[rev2])(block)
        # step 2: twiddles w^(i1 * k2), i1 global
        my = jax.lax.axis_index("shard")
        rows = block.shape[0]
        i1 = (my * rows + jnp.arange(rows, dtype=jnp.uint32))[:, None]
        k2 = jnp.arange(n2, dtype=jnp.uint32)[None, :]
        # i1 * k2 < n1 * n2 = n <= 2^31, so uint32 products are exact
        idx = ((i1 * k2) % jnp.uint32(n)).astype(jnp.int32)
        a = fj.mul(a, w_rep[idx])
        # step 3: distributed transpose (all-to-all)
        b = jax.lax.all_to_all(a, "shard", split_axis=1, concat_axis=0, tiled=True)
        # b: (n1, n2/D, 4); step 4: column NTTs of length n1
        c = jax.vmap(lambda v: fj._ntt_stages(v, tw1)[rev1], in_axes=1, out_axes=1)(b)
        return c

    return shard_map(
        local, mesh=mesh,
        in_specs=(P("shard", None, None), P(None, None)),
        out_specs=P(None, "shard", None),
    )(matrix, w_full)


# sharding of the most recent transform's matrix OUTPUT (before the final
# reshape to (n, 4), which re-replicates) - inspected by mesh tests
LAST_SHARDING = None


def ntt_sharded(x, mesh, root_int=None):
    """Natural-order NTT of (n, 4) limbs distributed over `mesh` ("shard" axis)."""
    global LAST_SHARDING
    n = x.shape[0]
    if root_int is None:
        root_int = field.get_root_of_unity(n)
    n1, n2 = _split(n)
    n_dev = mesh.devices.size
    assert n1 % n_dev == 0, f"n1={n1} must be divisible by mesh size {n_dev}"

    # input matrix M[i1, i2] = x[i1 + n1*i2]  (reshape column-major)
    matrix = x.reshape(n2, n1, 4).transpose(1, 0, 2)
    w_full = fj.power_series(int(root_int), n)

    out = _ntt_sharded_impl(matrix, w_full, n1, n2, int(root_int), mesh)
    LAST_SHARDING = out.sharding
    # Out[k1, k2] row-major is the natural-order result
    return out.reshape(n, 4)


def intt_sharded(x, mesh, root_int=None):
    """Inverse transform: sharded NTT with the inverse root + 1/n scaling."""
    n = x.shape[0]
    if root_int is None:
        root_int = field.get_root_of_unity(n)
    inv_root = pow(int(root_int), n - 1, field.M)
    out = ntt_sharded(x, mesh, inv_root)
    inv_n = field.inv(n)
    return fj.mul(out, jnp.broadcast_to(fj.constant(inv_n), out.shape))
