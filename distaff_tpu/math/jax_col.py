"""JaxCol: device field columns behind int-like operators, plus batched
helpers that keep the traced XLA graph compact.

The polymorphic AIR (stark/constraints/) is written as plain ``(a*b) % M``
expressions; JaxCol lets that single source run as one jit-traced device
kernel.  A naive trace emits one multi-precision multiply subgraph per
scalar expression (~1k muls x ~350 HLO ops each) and XLA compile time blows
up, so the structured hot spots - op-flag products, MDS applications, stack
shift checks, linear combinations - go through the stacked helpers below:
one (k, n, 4) limb multiply instead of k scalar-column multiplies, with
bit-identical field values.
"""

import numpy as np
import jax.numpy as jnp

from . import field
from . import field_jax as fj

M = field.M


class JaxCol:
    """A device column of field elements ((n, 4) uint32 limbs) behind the
    int-like operators the polymorphic AIR expects.  Python-int operands
    coerce to broadcast limb constants; every operation reduces mod M."""

    __slots__ = ("arr",)
    __array_priority__ = 200

    def __init__(self, arr):
        self.arr = arr

    def _coerce(self, other):
        if isinstance(other, JaxCol):
            return other.arr
        if isinstance(other, (int, np.integer)):
            return fj.constant(int(other) % M)
        return None

    def __add__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        return JaxCol(fj.add(self.arr, o))

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        return JaxCol(fj.sub(self.arr, o))

    def __rsub__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        return JaxCol(fj.sub(o, self.arr))

    def __mul__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        return JaxCol(fj.mul(self.arr, o))

    __rmul__ = __mul__

    def __mod__(self, modulus):
        assert modulus == M
        return self


def is_jax(*values):
    """True if any value is a JaxCol (AIR fast-path dispatch)."""
    return any(isinstance(v, JaxCol) for v in values)


def col_length(values):
    for v in values:
        if isinstance(v, JaxCol):
            return v.arr.shape[0]
    raise TypeError("no JaxCol operand")


def as_arr(value, n):
    """JaxCol or Python int -> (n, 4) device array."""
    if isinstance(value, JaxCol):
        return jnp.broadcast_to(value.arr, (n, 4))
    return fj.full((n,), int(value) % M)


def stack_cols(values, n):
    """list of JaxCol/int -> (k, n, 4) device array."""
    return jnp.stack([as_arr(v, n) for v in values])


def unstack(arr):
    return [JaxCol(arr[i]) for i in range(arr.shape[0])]


def mul_flag(flag, values):
    """flag * values[i] for every i with ONE batched multiply -> list[JaxCol]."""
    n = col_length([flag] + list(values))
    stacked = stack_cols(values, n)
    if isinstance(flag, JaxCol):
        f = flag.arr[None]
    else:
        f = fj.full((1, n), int(flag) % M)
    return unstack(fj.mul(stacked, f))


def pow3_all(values):
    """[v^3 for v] with two batched multiplies."""
    n = col_length(values)
    s = stack_cols(values, n)
    return unstack(fj.mul(fj.mul(s, s), s))


def mds_apply(state, mds, width):
    """MDS matrix (python ints, row-major width x width) times state vector
    of JaxCol/int -> list[JaxCol]; one batched multiply + log-depth sums."""
    n = col_length(state)
    s = stack_cols(state, n)                                # (w, n, 4)
    mds_arr = fj.from_ints(
        np.array(mds, dtype=object).reshape(width, width))  # (w, w, 4)
    products = fj.mul(mds_arr[:, :, None, :], s[None, :, :, :])  # (w, w, n, 4)
    return unstack(fj.sum_reduce(products, axis=1))


def weighted_sum(values, weights):
    """sum_i weights[i] * values[i] (weights: (k, 4) device array) with one
    batched multiply + log-depth sum -> JaxCol."""
    n = col_length(values)
    s = stack_cols(values, n)
    return JaxCol(fj.sum_reduce(fj.mul(s, weights[:, None, :]), axis=0))
