"""Vectorized Goldilocks arithmetic on 32-bit limb pairs (TPU-native).

TPUs have no native 64-bit integer multiply, so a base-field element is
represented as a pair of uint32 limbs stacked on the LEADING axis:

    v.shape == (2, *batch),  v[0] = low 32 bits,  v[1] = high 32 bits,

with the canonical value v[1]*2^32 + v[0] in [0, p), p = 2^64 - 2^32 + 1.
All operations keep values canonical. Reduction uses the Goldilocks
identities 2^64 = 2^32 - 1 (mod p) and 2^96 = -1 (mod p).

This is the TPU-native replacement for the `twenty-first` crate's
`BFieldElement` arithmetic that the reference prover leans on everywhere
(e.g. /root/reference/triton-vm/src/arithmetic_domain.rs:107,
/root/reference/triton-vm/src/table/master_table.rs:1194-1250).
Semantics are tested element-for-element against
`triton_vm_tpu.fields.bfe` (plain Python ints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bfe import P

U32 = jnp.uint32
P_LO = 1
P_HI = 0xFFFF_FFFF
EPS = 0xFFFF_FFFF  # 2^32 - 1 == 2^64 mod p


# ------------------------------------------------------------------ helpers

def _c(x):
    """uint32 constant."""
    return jnp.asarray(x, U32)


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out (0/1 uint32)."""
    lo = alo + blo
    c0 = (lo < alo).astype(U32)
    hi1 = ahi + bhi
    c1 = (hi1 < ahi).astype(U32)
    hi = hi1 + c0
    c2 = (hi < c0).astype(U32)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out (0/1 uint32)."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    hi1 = ahi - bhi
    b1 = (ahi < bhi).astype(U32)
    hi = hi1 - b0
    b2 = (hi1 < b0).astype(U32)
    return lo, hi, b1 | b2


def _mul32(a, b):
    """Full 32x32 -> 64-bit product as (lo, hi) via 16-bit limbs."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    t = (ll >> 16) + lh          # <= 2^32 - 2^17 + 2^16, no overflow
    t2 = t + hl
    carry = (t2 < t).astype(U32)
    lo = (t2 << 16) | (ll & 0xFFFF)
    hi = hh + (t2 >> 16) + (carry << 16)
    return lo, hi


def _mul64(alo, ahi, blo, bhi):
    """Full 64x64 -> 128-bit product as 4 uint32 limbs (x0 lowest)."""
    l00, h00 = _mul32(alo, blo)
    l01, h01 = _mul32(alo, bhi)
    l10, h10 = _mul32(ahi, blo)
    l11, h11 = _mul32(ahi, bhi)
    x0 = l00
    # x1 = h00 + l01 + l10 (carries into x2)
    s1 = h00 + l01
    c1a = (s1 < h00).astype(U32)
    x1 = s1 + l10
    c1b = (x1 < s1).astype(U32)
    # x2 = h01 + h10 + l11 + carries (carries into x3)
    s2 = h01 + h10
    c2a = (s2 < h01).astype(U32)
    s2b = s2 + l11
    c2b = (s2b < s2).astype(U32)
    x2 = s2b + (c1a + c1b)
    c2c = (x2 < s2b).astype(U32)
    x3 = h11 + (c2a + c2b + c2c)
    return x0, x1, x2, x3


def _reduce128(x0, x1, x2, x3):
    """Reduce a 128-bit value (4 uint32 limbs) to canonical [0, p).

    n = x3*2^96 + x2*2^64 + (x1, x0)
      = (x1, x0) + x2*(2^32 - 1) - x3   (mod p).
    """
    # t0 = (x1, x0) - x3, folding a borrow with the 2^64 = EPS identity
    lo, hi, borrow = _sub64(x0, x1, x3, _c(0))
    blo, bhi, _ = _sub64(lo, hi, _c(EPS) * borrow, _c(0))
    lo, hi = blo, bhi
    # t1 = x2 * EPS = (x2 << 32) - x2
    t1_lo = _c(0) - x2
    t1_hi = x2 - (x2 != 0).astype(U32)
    lo, hi, carry = _add64(lo, hi, t1_lo, t1_hi)
    alo, ahi, _ = _add64(lo, hi, _c(EPS) * carry, _c(0))
    lo, hi = alo, ahi
    return _canon(lo, hi)


def _canon(lo, hi):
    """One conditional subtraction of p; input < 2^64, output < p."""
    geq = (hi == _c(P_HI)) & (lo >= _c(P_LO))
    m = geq.astype(U32)
    slo, shi, _ = _sub64(lo, hi, m * _c(P_LO), m * _c(P_HI))
    return jnp.stack([slo, shi])


# ------------------------------------------------------------- public API

def zeros(shape=()):
    return jnp.zeros((2, *shape), U32)


def ones(shape=()):
    z = np.zeros((2, *shape), np.uint32)
    z[0] = 1
    return jnp.asarray(z)


def full(shape, value: int):
    value %= P
    out = np.empty((2, *shape), np.uint32)
    out[0] = value & 0xFFFFFFFF
    out[1] = value >> 32
    return jnp.asarray(out)


def from_u64(arr) -> jax.Array:
    """numpy uint64 (or python-int list) array -> limb representation."""
    a = np.asarray(arr, np.uint64)
    return jnp.stack([
        jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
    ])


def to_u64(v) -> np.ndarray:
    a = np.asarray(v)
    return a[0].astype(np.uint64) | (a[1].astype(np.uint64) << np.uint64(32))


def add(a, b):
    lo, hi, carry = _add64(a[0], a[1], b[0], b[1])
    # carry => result is exactly a+b-p after adding EPS (see module docstring)
    lo2, hi2, _ = _add64(lo, hi, _c(EPS) * carry, _c(0))
    return _canon(lo2, hi2)


def sub(a, b):
    lo, hi, borrow = _sub64(a[0], a[1], b[0], b[1])
    lo2, hi2, _ = _sub64(lo, hi, _c(EPS) * borrow, _c(0))
    return jnp.stack([lo2, hi2])


def neg(a):
    is_zero = (a[0] | a[1]) == 0
    lo, hi, _ = _sub64(_c(P_LO), _c(P_HI), a[0], a[1])
    z = jnp.zeros_like(lo)
    return jnp.stack([jnp.where(is_zero, z, lo), jnp.where(is_zero, z, hi)])


def mul(a, b):
    x0, x1, x2, x3 = _mul64(a[0], a[1], b[0], b[1])
    return _reduce128(x0, x1, x2, x3)


def square(a):
    return mul(a, a)


def mul_const(a, k: int):
    """Multiply by a compile-time constant in [0, p)."""
    return mul(a, full(_bshape(a), k))


def _bshape(a):
    return a.shape[1:]


def pow_const(a, e: int):
    """a**e for a static non-negative integer exponent (unrolled)."""
    if e < 0:
        raise ValueError("negative exponent; invert first")
    result = ones(_bshape(a))
    base = a
    while e:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(a):
    """Fermat inversion a^(p-2); inputs must be nonzero."""
    return pow_const(a, P - 2)


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero(a):
    return (a[0] | a[1]) == 0


def select(mask, a, b):
    """Elementwise select: mask ? a : b (mask has batch shape)."""
    return jnp.where(mask[None], a, b)


def batch_inverse(v, axis: int):
    """Batch inversion along a batch axis (axis counted in batch dims,
    i.e. axis 0 is v.shape[1]). Zero inputs map to zero, matching
    twenty-first's `batch_inversion` convention used by the reference's
    log-derivative columns."""
    ax = axis + 1
    zero_mask = is_zero(v)
    one = ones(_bshape(v))
    safe = select(zero_mask, jnp.broadcast_to(one, v.shape), v)

    def op(x, y):
        return mul(x, y)

    # prefix[i] = x0*...*xi ; suffix[i] = xi*...*x_{n-1}
    prefix = jax.lax.associative_scan(op, safe, axis=ax)
    suffix = jax.lax.associative_scan(op, safe, axis=ax, reverse=True)
    n = v.shape[ax]
    total = jnp.take(prefix, jnp.array([n - 1]), axis=ax)
    total_inv = inv(total)  # ax-dim is 1, broadcasts below

    excl_prefix = jnp.roll(prefix, 1, axis=ax)
    excl_prefix = _set_index(excl_prefix, ax, 0, 1)
    excl_suffix = jnp.roll(suffix, -1, axis=ax)
    excl_suffix = _set_index(excl_suffix, ax, n - 1, 1)

    out = mul(mul(excl_prefix, excl_suffix), jnp.broadcast_to(total_inv, v.shape))
    return select(zero_mask, zeros(_bshape(v)), out)


def _set_index(v, ax, idx, value: int):
    lo = value & 0xFFFFFFFF
    hi = value >> 32
    ind = [slice(None)] * v.ndim
    ind[ax] = idx
    ind[0] = 0
    v = v.at[tuple(ind)].set(np.uint32(lo))
    ind[0] = 1
    v = v.at[tuple(ind)].set(np.uint32(hi))
    return v
