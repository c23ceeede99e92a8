"""Vectorized degree-3 extension field F_p[x]/(x^3 - x + 1) on TPU.

An XFE array is a triple of gf limb pairs:

    v = (c0, c1, c2),  each c_i = (lo, hi) uint32 arrays of the batch shape.

TPU-native replacement for `twenty-first`'s `XFieldElement` as used by the
reference (e.g. /root/reference/triton-vm/src/stark.rs:427-433). Tested
against `triton_vm_tpu.fields.xfe`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import gf
from ..fields import xfe as _sxfe
from ..fields.bfe import P


def shape(a):
    return a[0][0].shape


def tmap(fn, *vs):
    """Apply an array op to each of the 6 underlying u32 arrays."""
    return tuple(gf.tmap(fn, *cs) for cs in zip(*vs))


def zeros(shape=()):
    z = gf.zeros(shape)
    return (z, z, z)


def ones(shape=()):
    return (gf.ones(shape), gf.zeros(shape), gf.zeros(shape))


def full(shape, value):
    """value: scalar XFE as (c0, c1, c2) python ints."""
    return tuple(gf.full(shape, c) for c in value)


def from_coeffs(c0, c1, c2):
    return (c0, c1, c2)


def lift(b):
    """gf pair -> XFE with zero x and x^2 coefficients."""
    z = gf.zeros(gf.shape(b))
    return (b, z, z)


def from_u64(arr):
    """numpy array (..., 3) of u64 coefficient triples -> XFE tuple."""
    a = np.asarray(arr, np.uint64)
    return tuple(gf.from_u64(a[..., i]) for i in range(3))


def to_u64(v) -> np.ndarray:
    return np.stack([gf.to_u64(v[i]) for i in range(3)], axis=-1)


def add(a, b):
    return tuple(gf.add(a[i], b[i]) for i in range(3))


def sub(a, b):
    return tuple(gf.sub(a[i], b[i]) for i in range(3))


def neg(a):
    return tuple(gf.neg(a[i]) for i in range(3))


def mul(a, b):
    """Schoolbook product reduced by x^3 = x - 1, x^4 = x^2 - x."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    d0 = gf.mul(a0, b0)
    d1 = gf.add(gf.mul(a0, b1), gf.mul(a1, b0))
    d2 = gf.add(gf.add(gf.mul(a0, b2), gf.mul(a1, b1)), gf.mul(a2, b0))
    d3 = gf.add(gf.mul(a1, b2), gf.mul(a2, b1))
    d4 = gf.mul(a2, b2)
    c0 = gf.sub(d0, d3)
    c1 = gf.add(d1, gf.sub(d3, d4))
    c2 = gf.add(d2, d4)
    return (c0, c1, c2)


def bfe_mul(a, s):
    """XFE times gf pair (elementwise)."""
    return tuple(gf.mul(a[i], s) for i in range(3))


def square(a):
    return mul(a, a)


def pow_const(a, e: int):
    if e < 0:
        raise ValueError("negative exponent; invert first")
    result = ones(shape(a))
    base = a
    while e:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


# Frobenius constants x^p, x^2p mod (x^3 - x + 1), computed once on host.
_XP = _sxfe.mod_pow(_sxfe.X, P)
_XP2 = _sxfe.mul(_XP, _XP)


def _frobenius(a):
    sh = shape(a)
    xp = full(sh, _XP)
    xp2 = full(sh, _XP2)
    t = bfe_mul(xp, a[1])
    u = bfe_mul(xp2, a[2])
    return add(add(lift(a[0]), t), u)


def inv(a):
    """a^-1 = phi(a)*phi^2(a) / Norm(a); nonzero inputs only."""
    ap = _frobenius(a)
    app = _frobenius(ap)
    adj = mul(ap, app)
    norm = mul(a, adj)[0]  # norm lies in the base field
    return bfe_mul(adj, gf.inv(norm))


def eq(a, b):
    return gf.eq(a[0], b[0]) & gf.eq(a[1], b[1]) & gf.eq(a[2], b[2])


def is_zero(a):
    return gf.is_zero(a[0]) & gf.is_zero(a[1]) & gf.is_zero(a[2])


def select(mask, a, b):
    return tuple(gf.select(mask, a[i], b[i]) for i in range(3))


def batch_inverse(v, axis: int):
    """Batch inversion along a batch axis; zeros map to zero."""
    zero_mask = is_zero(v)
    one = tmap(lambda x: jnp.broadcast_to(x, shape(v)), ones(()))
    safe = select(zero_mask, one, v)

    prefix = jax.lax.associative_scan(mul, safe, axis=axis)
    suffix = jax.lax.associative_scan(mul, safe, axis=axis, reverse=True)
    n = shape(v)[axis]
    total = tmap(lambda x: jnp.take(x, jnp.array([n - 1]), axis=axis), prefix)
    total_inv = tmap(lambda x: jnp.broadcast_to(x, shape(v)), inv(total))

    excl_prefix = _shift_one(prefix, axis, 1)
    excl_suffix = _shift_one(suffix, axis, -1)
    out = mul(mul(excl_prefix, excl_suffix), total_inv)
    return select(zero_mask, zeros(shape(v)), out)


def _shift_one(v, axis, direction):
    rolled = tmap(lambda x: jnp.roll(x, direction, axis=axis), v)
    n = shape(v)[axis]
    idx = [slice(None)] * len(shape(v))
    idx[axis] = 0 if direction == 1 else n - 1
    idx = tuple(idx)

    def fix(x, value):
        return x.at[idx].set(np.uint32(value))

    c0 = (fix(rolled[0][0], 1), fix(rolled[0][1], 0))
    c1 = (fix(rolled[1][0], 0), fix(rolled[1][1], 0))
    c2 = (fix(rolled[2][0], 0), fix(rolled[2][1], 0))
    return (c0, c1, c2)
