"""Device-side radix-4 FRI layer folding.

The reference interpolates each 4-point row into a cubic and evaluates it at
special_x (reference src/stark/fri/prover.rs:24-33).  On device we evaluate
the Lagrange form directly at special_x - the same rational function, so the
field values are identical - with one batched Fermat inversion for the
denominators:

    fold(row) = sum_k y_k * prod_{j != k}(sx - x_j) / prod_{j != k}(x_k - x_j)
"""

import functools

import jax
import jax.numpy as jnp

from ..math import field_jax as fj


@jax.jit
def fold_rows(ys, xs, special_x):
    """ys, xs: (q, 4, 4limbs) rows; special_x: (4,) limbs -> (q, 4limbs)."""
    sx = jnp.broadcast_to(special_x, xs[:, 0, :].shape)

    # numerators N_k = prod_{j != k} (sx - x_j)
    d = [fj.sub(sx, xs[:, j, :]) for j in range(4)]
    n0 = fj.mul(fj.mul(d[1], d[2]), d[3])
    n1 = fj.mul(fj.mul(d[0], d[2]), d[3])
    n2 = fj.mul(fj.mul(d[0], d[1]), d[3])
    n3 = fj.mul(fj.mul(d[0], d[1]), d[2])

    # denominators D_k = prod_{j != k} (x_k - x_j)
    def diff(a, b):
        return fj.sub(xs[:, a, :], xs[:, b, :])

    d0 = fj.mul(fj.mul(diff(0, 1), diff(0, 2)), diff(0, 3))
    d1 = fj.mul(fj.mul(diff(1, 0), diff(1, 2)), diff(1, 3))
    d2 = fj.mul(fj.mul(diff(2, 0), diff(2, 1)), diff(2, 3))
    d3 = fj.mul(fj.mul(diff(3, 0), diff(3, 1)), diff(3, 2))

    dens = jnp.stack([d0, d1, d2, d3], axis=1)          # (q, 4, 4limbs)
    inv_dens = fj.inv_batch(dens.reshape(-1, 4)).reshape(dens.shape)

    acc = fj.mul(fj.mul(ys[:, 0, :], n0), inv_dens[:, 0, :])
    acc = fj.add(acc, fj.mul(fj.mul(ys[:, 1, :], n1), inv_dens[:, 1, :]))
    acc = fj.add(acc, fj.mul(fj.mul(ys[:, 2, :], n2), inv_dens[:, 2, :]))
    acc = fj.add(acc, fj.mul(fj.mul(ys[:, 3, :], n3), inv_dens[:, 3, :]))
    return acc


@functools.partial(jax.jit, static_argnums=(1,))
def transpose_quartic(values, stride):
    """quartic::transpose on device: (n, 4limbs) -> (n/(4*stride), 4, 4limbs),
    rows[i][j] = values[(i + j*row_count) * stride]."""
    n = values.shape[0]
    row_count = n // (4 * stride)
    i = jnp.arange(row_count)
    idx = jnp.stack([(i + j * row_count) * stride for j in range(4)], axis=1)
    return values[idx]
