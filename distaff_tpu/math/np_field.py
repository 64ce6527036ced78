"""Vectorized host field columns: numpy uint64 limbs behind int-like operators.

FieldCol holds field elements as four 32-bit limbs in uint64 lanes of shape
(n, 4) and overloads +, -, *, % so the polymorphic AIR constraint code
(written as plain ``(a * b) % M`` expressions over scalars or columns) runs
on it unchanged - every operation reduces immediately, which is equivalent
for the AIR's polynomial expressions.

Multiplication is 16 exact 32x32->64 cross products with split lo/hi
accumulation, then the usual folding through R = 2^128 mod M = 45*2^40 - 1.
This replaces the Python-bigint object arrays on the prover's columnar
constraint sweep (~50x faster) and its limb layout converts to the device
uint32 representation with a cast instead of bigint round-trips.
"""

import numpy as np

from . import field

M = field.M
_MASK32 = np.uint64(0xFFFFFFFF)

_M_LIMBS = np.array([(M >> (32 * k)) & 0xFFFFFFFF for k in range(4)], dtype=np.uint64)
_R = 45 * 2**40 - 1
_R_LIMBS = np.array([(_R >> (32 * k)) & 0xFFFFFFFF for k in range(3)], dtype=np.uint64)


def _carry_normalize(cols, out_len):
    """List of u64 arrays (values < 2^63) -> out_len arrays of 32-bit limbs."""
    out = []
    carry = np.zeros_like(cols[0])
    for k in range(out_len):
        v = (cols[k] if k < len(cols) else np.zeros_like(carry)) + carry
        out.append(v & _MASK32)
        carry = v >> np.uint64(32)
    return out


def _borrow_sub(a, b):
    """Limb-wise a - b with borrow chain; returns (limbs, borrow_out)."""
    n = max(len(a), len(b))
    out = []
    borrow = np.zeros_like(a[0])
    big = np.uint64(1) << np.uint64(32)
    for k in range(n):
        ak = a[k] if k < len(a) else np.zeros_like(borrow)
        bk = b[k] if k < len(b) else np.zeros_like(borrow)
        t = ak + big - bk - borrow
        out.append(t & _MASK32)
        borrow = np.uint64(1) - (t >> np.uint64(32))
    return out, borrow


def _mul_by_r(h):
    """x * R for x given as a list of 32-bit limbs; minuend-side exact."""
    t = _carry_normalize([hk * np.uint64(45) for hk in h], len(h) + 1)
    t = _carry_normalize([tk << np.uint64(8) for tk in t], len(h) + 2)
    z = [np.zeros_like(h[0])] + t  # << 32
    out, _ = _borrow_sub(z, h)
    return out


def _reduce_mod_m(limbs):
    """Reduce a value given as 32-bit limbs (<= 8) -> 4 limbs < M."""
    while len(limbs) > 4:
        lo, hi = limbs[:4], limbs[4:]
        folded = _mul_by_r(hi)
        cols = [
            (folded[k] if k < len(folded) else np.zeros_like(limbs[0]))
            + (lo[k] if k < 4 else np.zeros_like(limbs[0]))
            for k in range(max(len(folded), 4))
        ]
        limbs = _carry_normalize(cols, len(cols) + 1)
        # trim empty high limbs
        while len(limbs) > 4 and not limbs[-1].any():
            limbs.pop()
    m = [np.full_like(limbs[0], w) for w in _M_LIMBS]
    d, borrow = _borrow_sub(limbs, m)
    use_d = borrow == 0
    return [np.where(use_d, d[k], limbs[k]) for k in range(4)]


class FieldCol:
    """A column (or scalar broadcast) of field elements in u64-lane limbs."""

    __slots__ = ("limbs",)
    __array_priority__ = 100  # beat numpy's operators when mixed

    def __init__(self, limbs):
        self.limbs = limbs  # (n, 4) uint64, each < 2^32

    # construction --------------------------------------------------------------------------------

    @staticmethod
    def from_u32(arr):
        """(n, 4) uint32 device-layout limbs -> FieldCol."""
        return FieldCol(np.ascontiguousarray(arr).astype(np.uint64))

    @staticmethod
    def from_object(arr):
        """numpy object array of ints -> FieldCol."""
        arr = np.asarray(arr, dtype=object)
        limbs = np.stack(
            [((arr >> (32 * k)) & 0xFFFFFFFF).astype(np.uint64) for k in range(4)],
            axis=-1)
        return FieldCol(limbs)

    @staticmethod
    def from_int(value, n):
        row = np.array([(int(value) >> (32 * k)) & 0xFFFFFFFF for k in range(4)],
                       dtype=np.uint64)
        return FieldCol(np.broadcast_to(row, (n, 4)).copy())

    def to_u32(self):
        return self.limbs.astype(np.uint32)

    def to_object(self):
        o = self.limbs.astype(object)
        return o[:, 0] | (o[:, 1] << 32) | (o[:, 2] << 64) | (o[:, 3] << 96)

    def __len__(self):
        return self.limbs.shape[0]

    def __getitem__(self, idx):
        picked = self.limbs[idx]
        if picked.ndim == 1:
            picked = picked[None, :]
        return FieldCol(picked)

    def roll(self, shift):
        return FieldCol(np.roll(self.limbs, shift, axis=0))

    def nonzero_mask(self):
        return self.limbs.any(axis=1)

    # arithmetic ----------------------------------------------------------------------------------

    def _coerce(self, other):
        if isinstance(other, FieldCol):
            return other
        if isinstance(other, (int, np.integer)):
            return FieldCol.from_int(int(other) % M, len(self))
        if isinstance(other, np.ndarray) and other.dtype == object:
            return FieldCol.from_object(other)
        return NotImplemented

    def __add__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        a, b = np.broadcast_arrays(self.limbs, o.limbs)
        cols = [a[..., k] + b[..., k] for k in range(4)]
        limbs = _carry_normalize(cols, 5)
        # a + b < 2M, so a single conditional subtract of M suffices
        m5 = [np.full_like(limbs[0], w) for w in _M_LIMBS] + [np.zeros_like(limbs[0])]
        d, borrow = _borrow_sub(limbs, m5)
        use_d = borrow == 0
        out = [np.where(use_d, d[k], limbs[k]) for k in range(4)]
        return FieldCol(np.stack(out, axis=-1))

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        a, b = np.broadcast_arrays(self.limbs, o.limbs)
        d, borrow = _borrow_sub([a[..., k] for k in range(4)], [b[..., k] for k in range(4)])
        m = [np.full_like(d[0], w) for w in _M_LIMBS]
        cols = [d[k] + np.where(borrow > 0, m[k], np.zeros_like(m[k])) for k in range(4)]
        limbs = _carry_normalize(cols, 4)
        return FieldCol(np.stack(limbs, axis=-1))

    def __rsub__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        return o.__sub__(self)

    def __mul__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        a, b = np.broadcast_arrays(self.limbs, o.limbs)
        cols = [None] * 8
        for i in range(4):
            for j in range(4):
                p = a[..., i] * b[..., j]
                lo = p & _MASK32
                hi = p >> np.uint64(32)
                k = i + j
                cols[k] = lo if cols[k] is None else cols[k] + lo
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        limbs = _carry_normalize(cols, 9)
        while len(limbs) > 8 and not limbs[-1].any():
            limbs.pop()
        return FieldCol(np.stack(_reduce_mod_m(limbs), axis=-1))

    __rmul__ = __mul__

    def __mod__(self, modulus):
        assert modulus == M
        return self

    def __eq__(self, other):  # pragma: no cover - debugging convenience
        o = self._coerce(other)
        return bool((self.limbs == o.limbs).all())
