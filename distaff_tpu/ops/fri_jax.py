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


def _limb_const(v):
    return jnp.array(
        [(int(v) >> (32 * k)) & 0xFFFFFFFF for k in range(4)], dtype=jnp.uint32)


def _fold_rows_impl(ys, x0, inv_x0_cubed, special_x):
    """ys: (q, 4, 4limbs) rows; x0: (q, 4limbs) first-column nodes;
    inv_x0_cubed: (q, 4limbs) = x0^-3; special_x: (4,) limbs -> (q, 4limbs).

    The x0 nodes are root-of-unity powers w^i, so their inverse cubes are
    the power series of w^-3 - the caller supplies them directly (one extra
    power series per proof, strided per layer) instead of a 127-deep Fermat
    inversion chain here (measured ~25 ms of sequential squarings per fold
    tile).

    Independent multiplies are batched into stacked single call sites (one
    traced modmul over a (k, q, 4) stack instead of k separate modmul
    graphs): each fj.mul inlines ~400 scalar ops of limb arithmetic, and
    the fully unrolled 15-site version took minutes of XLA:CPU compile."""
    q = x0.shape[0]
    sx = jnp.broadcast_to(special_x, x0.shape)

    # node coordinates x_j = x0 * I^j, all three scalar muls in one site
    c_stack = jnp.stack([_limb_const(_C[j]) for j in (1, 2, 3)])  # (3, 4)
    xj123 = fj.mul(jnp.broadcast_to(x0[None], (3, q, 4)),
                   jnp.broadcast_to(c_stack[:, None, :], (3, q, 4)))
    xj = jnp.concatenate([x0[None], xj123])                       # (4, q, 4)
    d = fj.sub(jnp.broadcast_to(sx[None], (4, q, 4)), xj)

    # pair products, then numerators N_k = prod_{j != k} (sx - x_j)
    p = fj.mul(jnp.stack([d[0], d[2]]), jnp.stack([d[1], d[3]]))
    d01, d23 = p[0], p[1]
    n = fj.mul(jnp.stack([d[1], d[0], d01, d01]),
               jnp.stack([d23, d23, d[3], d[2]]))                 # (4, q, 4)

    invk = jnp.stack([_limb_const(k) for k in _INV_K])            # (4, 4)
    yn = fj.mul(ys.transpose(1, 0, 2), n)
    ynk = fj.mul(yn, jnp.broadcast_to(invk[:, None, :], (4, q, 4)))
    acc = fj.add(fj.add(ynk[0], ynk[1]), fj.add(ynk[2], ynk[3]))
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
