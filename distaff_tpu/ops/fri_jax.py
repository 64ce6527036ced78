"""Device-side radix-4 FRI layer folding.

The reference interpolates each 4-point row into a cubic and evaluates it at
special_x (reference src/stark/fri/prover.rs:24-33).  On device we evaluate
the Lagrange form directly at special_x - the same rational function over the
same nodes, so the field values are bit-identical.

TPU-first structure: the four x-coordinates of every FRI row are
x, I*x, I^2*x, I^3*x where I = G^(2^38) is the canonical primitive 4th root
of unity (independent of the domain size: g_n^(n/4) = G^(2^40/4)).  The
Lagrange denominators therefore factor as

    D_k = prod_{j != k} (x_k - x_j) = x^3 * prod_{j != k} (I^k - I^j)
        = x^3 * K_k

with K_k a global constant.  One batched inversion of the first-column x's
(a quarter of the naive 4q inversions) and constant multiplications by
1/K_k replace the reference's per-row interpolation, and the per-layer
x-coordinate "transpose" disappears entirely: each layer's first column is a
[::4] stride of the previous one.
"""

import functools

import jax
import jax.numpy as jnp

from ..math import field_jax as fj
from ..math import field as hostfield

M = hostfield.M

# I = primitive 4th root of unity; the row nodes are x * I^j
_I = hostfield.exp(hostfield.G, 1 << 38)
_C = [1, _I, hostfield.mul(_I, _I), hostfield.mul(hostfield.mul(_I, _I), _I)]
# K_k = prod_{j != k} (I^k - I^j); constant Lagrange denominators
_INV_K = [
    hostfield.inv(
        hostfield.mul(
            hostfield.mul(
                hostfield.sub(_C[k], _C[(k + 1) % 4]),
                hostfield.sub(_C[k], _C[(k + 2) % 4])),
            hostfield.sub(_C[k], _C[(k + 3) % 4])))
    for k in range(4)
]


def _fold_rows_impl(ys, x0, special_x):
    """ys: (q, 4, 4limbs) rows; x0: (q, 4limbs) first-column nodes;
    special_x: (4,) limbs -> (q, 4limbs)."""
    sx = jnp.broadcast_to(special_x, x0.shape)

    # node coordinates x_j = x0 * I^j (I^0 = 1)
    xj = [x0] + [fj.mul_scalar(x0, _C[j]) for j in (1, 2, 3)]
    d = [fj.sub(sx, xj[j]) for j in range(4)]

    # numerators N_k = prod_{j != k} (sx - x_j)
    d01 = fj.mul(d[0], d[1])
    d23 = fj.mul(d[2], d[3])
    n0 = fj.mul(d[1], d23)
    n1 = fj.mul(d[0], d23)
    n2 = fj.mul(d01, d[3])
    n3 = fj.mul(d01, d[2])

    # 1 / D_k = inv(x0)^3 * (1 / K_k)
    inv_x0 = fj.inv_batch(x0)
    inv_x0_cubed = fj.mul(fj.sqr(inv_x0), inv_x0)

    acc = fj.mul_scalar(fj.mul(ys[:, 0, :], n0), _INV_K[0])
    acc = fj.add(acc, fj.mul_scalar(fj.mul(ys[:, 1, :], n1), _INV_K[1]))
    acc = fj.add(acc, fj.mul_scalar(fj.mul(ys[:, 2, :], n2), _INV_K[2]))
    acc = fj.add(acc, fj.mul_scalar(fj.mul(ys[:, 3, :], n3), _INV_K[3]))
    return fj.mul(acc, inv_x0_cubed)


fold_rows = jax.jit(_fold_rows_impl)


@functools.partial(jax.jit, static_argnums=(1,))
def transpose_quartic(values, stride):
    """quartic::transpose on device: (n, 4limbs) -> (n/(4*stride), 4, 4limbs),
    rows[i][j] = values[(i + j*row_count) * stride].

    Pure strided-slice + reshape + transpose - no gather: with
    v = values[::stride], v[j*rc + i] = values[(i + j*rc)*stride]."""
    n = values.shape[0]
    row_count = n // (4 * stride)
    v = values[::stride] if stride > 1 else values
    return v.reshape(4, row_count, 4).transpose(1, 0, 2)
