"""Vectorized Goldilocks arithmetic on 32-bit limb pairs (TPU-native).

TPUs have no native 64-bit integer multiply, so a base-field element array
is a PAIR (tuple) of uint32 arrays:

    v = (lo, hi),  lo.shape == hi.shape == batch shape,

with canonical value hi*2^32 + lo in [0, p), p = 2^64 - 2^32 + 1. All
operations keep values canonical. Reduction uses the Goldilocks identities
2^64 = 2^32 - 1 (mod p) and 2^96 = -1 (mod p).

Why tuples and not a stacked (2, ...) array: XLA fuses through
concatenate/slice pairs by *duplicating* the producer computation, which is
exponential in the depth of a mul chain (measured: pow7 = 8800x the cost of
a single mul on XLA:CPU). Tuples are pytree leaves and never materialize a
concatenate.

This replaces the `twenty-first` crate's `BFieldElement` arithmetic used
throughout the reference (e.g. /root/reference/triton-vm/src/
arithmetic_domain.rs:107, table/master_table.rs:1194-1250). Tested
element-for-element against `triton_vm_tpu.fields.bfe`.
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
    return jnp.asarray(x, U32)


def _mask_val(mask, value):
    """where(mask, value, 0) for a bool mask and a u32 constant/array.

    Written as a select rather than `mask.astype(U32) * value`: XLA's
    algebraic simplifier canonicalizes mask-multiplies into selects ONE
    REWRITE PER FIXED-POINT ITERATION, re-running the whole
    simplification pipeline (and recloning while bodies) each time —
    measured 50+ iterations / multi-minute compiles on the prover's
    fused kernels. Emitting the normal form directly converges in a few
    passes."""
    value = jnp.broadcast_to(_c(value), mask.shape)
    return jnp.where(mask, value, jnp.zeros_like(value))


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out (bool)."""
    lo = alo + blo
    c0 = lo < alo
    hi1 = ahi + bhi
    c1 = hi1 < ahi
    hi = hi1 + _mask_val(c0, 1)
    c2 = (hi == 0) & c0
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out (bool)."""
    lo = alo - blo
    b0 = alo < blo
    hi1 = ahi - bhi
    b1 = ahi < bhi
    hi = hi1 - _mask_val(b0, 1)
    b2 = (hi1 == 0) & b0
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
    carry = t2 < t
    lo = (t2 << 16) | (ll & 0xFFFF)
    hi = hh + (t2 >> 16) + _mask_val(carry, 1 << 16)
    return lo, hi


def _mul64(alo, ahi, blo, bhi):
    """Full 64x64 -> 128-bit product as 4 uint32 limbs (x0 lowest)."""
    l00, h00 = _mul32(alo, blo)
    l01, h01 = _mul32(alo, bhi)
    l10, h10 = _mul32(ahi, blo)
    l11, h11 = _mul32(ahi, bhi)
    x0 = l00
    s1 = h00 + l01
    c1a = _mask_val(s1 < h00, 1)
    x1 = s1 + l10
    c1b = _mask_val(x1 < s1, 1)
    s2 = h01 + h10
    c2a = _mask_val(s2 < h01, 1)
    s2b = s2 + l11
    c2b = _mask_val(s2b < s2, 1)
    x2 = s2b + (c1a + c1b)
    c2c = _mask_val(x2 < s2b, 1)
    x3 = h11 + (c2a + c2b + c2c)
    return x0, x1, x2, x3


def _reduce128(x0, x1, x2, x3):
    """Reduce a 128-bit value (4 uint32 limbs) to canonical [0, p).

    n = x3*2^96 + x2*2^64 + (x1, x0)
      = (x1, x0) + x2*(2^32 - 1) - x3   (mod p).
    """
    zero = jnp.zeros_like(x3)
    lo, hi, borrow = _sub64(x0, x1, x3, zero)
    lo, hi, _ = _sub64(lo, hi, _mask_val(borrow, EPS), zero)
    t1_lo = jnp.zeros_like(x2) - x2
    t1_hi = x2 - _mask_val(x2 != 0, 1)
    lo, hi, carry = _add64(lo, hi, t1_lo, t1_hi)
    lo, hi, _ = _add64(lo, hi, _mask_val(carry, EPS), zero)
    return _canon(lo, hi)


def _canon(lo, hi):
    """One conditional subtraction of p; input < 2^64, output < p."""
    geq = (hi == _c(P_HI)) & (lo >= _c(P_LO))
    slo, shi, _ = _sub64(lo, hi, _mask_val(geq, P_LO), _mask_val(geq, P_HI))
    return (slo, shi)


# ------------------------------------------------------------- public API

def tmap(fn, *vs):
    """Apply an array op to each limb: tmap(f, a) or tmap(f, a, b)."""
    return tuple(fn(*xs) for xs in zip(*vs))


def shape(v):
    return v[0].shape


def reshape(v, new_shape):
    return tmap(lambda x: x.reshape(new_shape), v)


def broadcast_to(v, new_shape):
    return tmap(lambda x: jnp.broadcast_to(x, new_shape), v)


def concatenate(vs, axis=0):
    return (jnp.concatenate([v[0] for v in vs], axis=axis),
            jnp.concatenate([v[1] for v in vs], axis=axis))


def stack(vs, axis=0):
    return (jnp.stack([v[0] for v in vs], axis=axis),
            jnp.stack([v[1] for v in vs], axis=axis))


def index(v, idx):
    """Index/slice the batch dimensions: index(v, (slice, ...))."""
    return (v[0][idx], v[1][idx])


def take(v, indices, axis=0):
    return tmap(lambda x: jnp.take(x, indices, axis=axis), v)


def zeros(shape=()):
    z = jnp.zeros(shape, U32)
    return (z, z)


def ones(shape=()):
    return (jnp.ones(shape, U32), jnp.zeros(shape, U32))


def full(shape, value: int):
    value %= P
    return (jnp.full(shape, np.uint32(value & 0xFFFFFFFF), U32),
            jnp.full(shape, np.uint32(value >> 32), U32))


def from_u64(arr):
    """numpy uint64 (or python-int list) array -> limb pair."""
    a = np.asarray(arr, np.uint64)
    return (jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((a >> np.uint64(32)).astype(np.uint32)))


def to_u64(v) -> np.ndarray:
    lo = np.asarray(v[0])
    hi = np.asarray(v[1])
    return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))


def add(a, b):
    lo, hi, carry = _add64(a[0], a[1], b[0], b[1])
    # carry => result is exactly a+b-p after adding EPS (see docstring)
    lo, hi, _ = _add64(lo, hi, _mask_val(carry, EPS), jnp.zeros_like(lo))
    return _canon(lo, hi)


def sub(a, b):
    lo, hi, borrow = _sub64(a[0], a[1], b[0], b[1])
    lo, hi, _ = _sub64(lo, hi, _mask_val(borrow, EPS), jnp.zeros_like(lo))
    return (lo, hi)


def neg(a):
    is_zero_ = (a[0] | a[1]) == 0
    lo, hi, _ = _sub64(_c(P_LO), _c(P_HI), a[0], a[1])
    z = jnp.zeros_like(lo)
    return (jnp.where(is_zero_, z, lo), jnp.where(is_zero_, z, hi))


def mul(a, b):
    x0, x1, x2, x3 = _mul64(a[0], a[1], b[0], b[1])
    return _reduce128(x0, x1, x2, x3)


def square(a):
    return mul(a, a)


def mul_const(a, k: int):
    """Multiply by a compile-time constant in [0, p)."""
    k %= P
    klo = _c(k & 0xFFFFFFFF)
    khi = _c(k >> 32)
    x0, x1, x2, x3 = _mul64(a[0], a[1], klo, khi)
    return _reduce128(x0, x1, x2, x3)


def pow_const(a, e: int):
    """a**e for a static non-negative integer exponent (unrolled)."""
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


def inv(a):
    """Fermat inversion a^(p-2); inputs must be nonzero.

    Square-and-multiply under lax.fori_loop: the unrolled 64-step chain
    (pow_const) sends XLA:CPU's algebraic simplifier into a circular
    simplification loop and blows up compile time; the rolled loop keeps
    the graph ~130 ops regardless of exponent width."""
    import jax
    e = P - 2
    bits = jnp.array([(e >> (63 - i)) & 1 for i in range(64)], jnp.uint32)

    def body(i, res):
        res = mul(res, res)
        return select(bits[i] == 1, mul(res, a), res)

    # MSB is 1: start from a (skips one squaring of 1)
    return jax.lax.fori_loop(1, 64, body, a)


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero(a):
    return (a[0] | a[1]) == 0


def select(mask, a, b):
    """Elementwise select: mask ? a : b (mask has batch shape)."""
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def reduce_sum(v, axis: int):
    """Sum a gf pair over one axis (exact mod-p; order-independent).

    Digit-plane formulation, one code path for every backend: split each
    32-bit limb into 16-bit digits, `jnp.sum` each digit plane over
    chunks of <= 2^15 elements (digit < 2^16, so a chunk sum fits u32
    exactly) with XLA's NATIVE add reduction, recombine the per-chunk
    digit sums into field elements (3 mul_const + adds), and fold the
    small chunk axis with a log-depth tree.

    Why not the alternatives (both measured):
    - lax.reduce with a custom mod-p combiner: XLA:CPU interprets the
      combiner per element — the prover's DEEP stage took 212 s at
      padded height 2^8 (vs ~0.1 s here);
    - a full halving tree over the raw axis: sends XLA:CPU's algebraic
      simplifier into a >300 s circular-rewrite loop when the summand
      contains a while op (e.g. `inv`).
    Native-add reductions have neither problem, and the remaining tree
    is <= 32 adds for any height up to 2^20. Bit-identical to both:
    addition mod p is associative/commutative on canonical values and
    the digit sums are exact integers."""
    import jax

    n = shape(v)[axis]
    if n == 0:
        new_shape = list(shape(v))
        del new_shape[axis]
        return zeros(tuple(new_shape))
    # Barrier between the summand's producer graph and the reduction:
    # without it XLA fuses the producer into EACH of the four digit-plane
    # reduces (re-computing it 4x) and, worse, feeds the simplifier
    # reduce(reshape(while ...)) patterns it rewrites circularly —
    # measured >13 min compiles for the OOD kernel. Identity op, no
    # numeric effect.
    v = jax.lax.optimization_barrier(tuple(v))
    axis = axis % len(shape(v))
    chunk = min(n, 1 << 15)
    nchunks = -(-n // chunk)
    if nchunks * chunk != n:
        pad = [(0, 0)] * len(shape(v))
        pad[axis] = (0, nchunks * chunk - n)
        v = tmap(lambda a: jnp.pad(a, pad), v)

    def digit_partials(limb):
        s = limb.shape
        r = limb.reshape(s[:axis] + (nchunks, chunk) + s[axis + 1:])
        lo16 = jnp.sum(r & 0xFFFF, axis=axis + 1, dtype=U32)
        hi16 = jnp.sum(r >> 16, axis=axis + 1, dtype=U32)
        return lo16, hi16  # each < 2^31: exact

    lo_lo, lo_hi = digit_partials(v[0])
    hi_lo, hi_hi = digit_partials(v[1])
    z = jnp.zeros_like(lo_lo)
    # recombine: total = d0 + d1*2^16 + d2*2^32 + d3*2^48 (mod p); each
    # digit sum is < 2^31 < p, so (sum, 0) is already a canonical element
    acc = add((lo_lo, z), mul_const((lo_hi, z), 1 << 16))
    acc = add(acc, mul_const((hi_lo, z), (1 << 32) % P))
    acc = add(acc, mul_const((hi_hi, z), (1 << 48) % P))
    # fold the (small) chunk axis with a log-depth tree of mod-p adds
    np2 = 1 << max(nchunks - 1, 0).bit_length()
    if np2 != nchunks:
        pad = [(0, 0)] * len(shape(acc))
        pad[axis] = (0, np2 - nchunks)
        acc = tmap(lambda a: jnp.pad(a, pad), acc)
    ix = [slice(None)] * len(shape(acc))
    while np2 > 1:
        half = np2 // 2
        lo_ix, hi_ix = list(ix), list(ix)
        lo_ix[axis] = slice(None, half)
        hi_ix[axis] = slice(half, None)
        acc = add(tmap(lambda a: a[tuple(lo_ix)], acc),
                  tmap(lambda a: a[tuple(hi_ix)], acc))
        np2 = half
    sq = list(ix)
    sq[axis] = 0
    return tmap(lambda a: a[tuple(sq)], acc)


def batch_inverse(v, axis: int):
    """Batch inversion along a batch axis. Zero inputs map to zero,
    matching twenty-first's `batch_inversion` convention used by the
    reference's log-derivative columns."""
    zero_mask = is_zero(v)
    one = broadcast_to(ones(()), shape(v))
    safe = select(zero_mask, one, v)

    prefix = jax.lax.associative_scan(mul, safe, axis=axis)
    suffix = jax.lax.associative_scan(mul, safe, axis=axis, reverse=True)
    n = shape(v)[axis]
    total = take(prefix, jnp.array([n - 1]), axis=axis)
    total_inv = broadcast_to(inv(total), shape(v))

    excl_prefix = _shift_one(prefix, axis, 1)
    excl_suffix = _shift_one(suffix, axis, -1)
    out = mul(mul(excl_prefix, excl_suffix), total_inv)
    return select(zero_mask, zeros(shape(v)), out)


def _shift_one(v, axis, direction):
    """Roll by one along axis, writing the identity (1) at the boundary."""
    rolled = tmap(lambda x: jnp.roll(x, direction, axis=axis), v)
    n = shape(v)[axis]
    idx = [slice(None)] * len(shape(v))
    idx[axis] = 0 if direction == 1 else n - 1
    idx = tuple(idx)
    lo = rolled[0].at[idx].set(np.uint32(1))
    hi = rolled[1].at[idx].set(np.uint32(0))
    return (lo, hi)
