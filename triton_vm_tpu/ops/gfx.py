"""Vectorized degree-3 extension field F_p[x]/(x^3 - x + 1) on TPU.

An XFE array stacks the three coefficients on the LEADING axis on top of
the base-field limb representation:

    v.shape == (3, 2, *batch),  v[i] = i-th coefficient as a gf array.

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


def _bshape(a):
    return a.shape[2:]


def zeros(shape=()):
    return jnp.zeros((3, 2, *shape), gf.U32)


def ones(shape=()):
    z = np.zeros((3, 2, *shape), np.uint32)
    z[0, 0] = 1
    return jnp.asarray(z)


def full(shape, value) -> jax.Array:
    """value: scalar XFE as (c0, c1, c2) python ints."""
    c0, c1, c2 = value
    out = np.empty((3, 2, *shape), np.uint32)
    for i, c in enumerate((c0 % P, c1 % P, c2 % P)):
        out[i, 0] = c & 0xFFFFFFFF
        out[i, 1] = c >> 32
    return jnp.asarray(out)


def from_coeffs(c0, c1, c2):
    """Three gf arrays -> one XFE array."""
    return jnp.stack([c0, c1, c2])


def lift(b):
    """gf array -> XFE array with zero x and x^2 coefficients."""
    return jnp.stack([b, jnp.zeros_like(b), jnp.zeros_like(b)])


def from_u64(arr) -> jax.Array:
    """numpy array (..., 3) of u64 coefficient triples -> XFE array."""
    a = np.asarray(arr, np.uint64)
    return jnp.stack([gf.from_u64(a[..., i]) for i in range(3)])


def to_u64(v) -> np.ndarray:
    """XFE array -> numpy (..., 3) u64."""
    return np.stack([gf.to_u64(v[i]) for i in range(3)], axis=-1)


def add(a, b):
    return jnp.stack([gf.add(a[i], b[i]) for i in range(3)])


def sub(a, b):
    return jnp.stack([gf.sub(a[i], b[i]) for i in range(3)])


def neg(a):
    return jnp.stack([gf.neg(a[i]) for i in range(3)])


def mul(a, b):
    """Schoolbook product reduced by x^3 = x - 1, x^4 = x^2 - x."""
    a0, a1, a2 = a[0], a[1], a[2]
    b0, b1, b2 = b[0], b[1], b[2]
    d0 = gf.mul(a0, b0)
    d1 = gf.add(gf.mul(a0, b1), gf.mul(a1, b0))
    d2 = gf.add(gf.add(gf.mul(a0, b2), gf.mul(a1, b1)), gf.mul(a2, b0))
    d3 = gf.add(gf.mul(a1, b2), gf.mul(a2, b1))
    d4 = gf.mul(a2, b2)
    c0 = gf.sub(d0, d3)
    c1 = gf.add(d1, gf.sub(d3, d4))
    c2 = gf.add(d2, d4)
    return jnp.stack([c0, c1, c2])


def bfe_mul(a, s):
    """XFE array times gf array (elementwise)."""
    return jnp.stack([gf.mul(a[i], s) for i in range(3)])


def square(a):
    return mul(a, a)


def pow_const(a, e: int):
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


# Frobenius constants x^p, x^2p mod (x^3 - x + 1), computed once on host.
_XP = _sxfe.mod_pow(_sxfe.X, P)
_XP2 = _sxfe.mul(_XP, _XP)


def _frobenius(a):
    xp = full(_bshape(a), _XP)
    xp2 = full(_bshape(a), _XP2)
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
    return jnp.where(mask[None, None], a, b)


def batch_inverse(v, axis: int):
    """Batch inversion along a batch axis; zeros map to zero."""
    ax = axis + 2
    zero_mask = is_zero(v)
    safe = select(zero_mask, jnp.broadcast_to(ones(_bshape(v)), v.shape), v)

    def op(x, y):
        # associative_scan passes stacked leaves; x,y are XFE arrays
        return mul(x, y)

    prefix = jax.lax.associative_scan(op, safe, axis=ax)
    suffix = jax.lax.associative_scan(op, safe, axis=ax, reverse=True)
    n = v.shape[ax]
    total = jnp.take(prefix, jnp.array([n - 1]), axis=ax)
    total_inv = inv(total)

    excl_prefix = jnp.roll(prefix, 1, axis=ax)
    excl_prefix = _set_one(excl_prefix, ax, 0)
    excl_suffix = jnp.roll(suffix, -1, axis=ax)
    excl_suffix = _set_one(excl_suffix, ax, n - 1)

    out = mul(mul(excl_prefix, excl_suffix), jnp.broadcast_to(total_inv, v.shape))
    return select(zero_mask, jnp.zeros_like(v), out)


def _set_one(v, ax, idx):
    ind = [slice(None)] * v.ndim
    ind[ax] = idx
    # zero the slice, then set the c0 low limb to 1 (the XFE one)
    for ci in range(3):
        for li in range(2):
            ind2 = list(ind)
            ind2[0] = ci
            ind2[1] = li
            val = np.uint32(1) if (ci == 0 and li == 0) else np.uint32(0)
            v = v.at[tuple(ind2)].set(val)
    return v
