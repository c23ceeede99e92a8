"""Radix-2 NTT / iNTT / coset LDE over the Goldilocks field, TPU-native.

Replaces `twenty-first`'s `ntt`/`intt` and the reference's fast coset
evaluate/interpolate (used at /root/reference/triton-vm/src/stark.rs:867-878,
992-1003 and arithmetic_domain.rs:141-189).

Design (gather-free LDE):
  * `ntt_dif`  — decimation-in-frequency: natural-order input,
                 BIT-REVERSED output. Used for interpolation (values ->
                 coefficients-in-bitrev).
  * `ntt_dit`  — decimation-in-time: BIT-REVERSED input, natural-order
                 output. Used for evaluation (coefficients-in-bitrev ->
                 values).
  * Zero-padding a degree-<n polynomial to a length-m domain happens in the
    bit-reversed coefficient domain, where it is a strided reshape
    (rev_M(j) = (m/n) * rev_N(j) for j < n) — no gather, no scatter.
  * Coset scaling by offset^i uses a bit-reversed power ladder, also
    gather-free.

Twiddles are built in-graph from scalar constants with log-depth doubling
ladders; XLA constant-folds or hoists them.

Values are gf limb pairs `(lo, hi)` whose arrays have shape (*batch, N);
the transform runs along the last axis. Outputs are the mathematical NTT
(evaluations at omega^k in natural order for `values_from_*`), so results
are value-identical to the reference regardless of algorithm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import bfe
from ..fields.bfe import P
from . import gf


def _powers(base: int, log_len: int, bitrev: bool):
    """gf pair of shape (2^log_len,): base^i (natural) or base^{rev(i)}."""
    v = gf.ones((1,))
    for t in range(log_len):
        e = 1 << (log_len - 1 - t) if bitrev else 1 << t
        c = pow(base, e, P)
        v = gf.concatenate([v, gf.mul_const(v, c)], axis=-1)
    return v


@functools.lru_cache(maxsize=None)
def _twiddle_table(n: int, root: int):
    """Stacked twiddles for the constant-geometry network, numpy
    (log2 n, n/2): W[s][k] = root^((k >> s) << s)."""
    import numpy as np

    log_n = n.bit_length() - 1
    W = np.empty((log_n, n // 2), np.uint64)
    for s in range(log_n):
        ladder_len = max(n >> (s + 1), 1)
        acc, step = 1, pow(root, 1 << s, P)
        ladder = np.empty(ladder_len, np.uint64)
        for j in range(ladder_len):
            ladder[j] = acc
            acc = acc * step % P
        W[s] = np.repeat(ladder, 1 << s)[:n // 2]
    return W


def ntt_dif(v, root: int):
    """DIF butterfly network: natural input -> bit-reversed output.

    Constant-geometry (Pease) formulation: every stage pairs
    (i, i + n/2) and perfect-shuffles the halves back together, so all
    log2(n) stages share one shape and run under a single fori_loop with
    a stacked twiddle table. This keeps the lowered module ~stage-sized
    instead of network-sized (the unrolled variant produced multi-MB
    StableHLO, which the tunneled TPU backend lowers pathologically
    slowly). Output values are bit-identical to the classic network.

    v: gf pair with array shape (*batch, n); root: primitive n-th root."""
    n = gf.shape(v)[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return v
    W = gf.from_u64(_twiddle_table(n, root))

    def body(s, v):
        u = gf.tmap(lambda a: a[..., :n // 2], v)
        t = gf.tmap(lambda a: a[..., n // 2:], v)
        w = gf.tmap(lambda a: a[s], W)
        lo = gf.add(u, t)
        hi = gf.mul(gf.sub(u, t), w)
        return gf.tmap(
            lambda a, b: jnp.stack([a, b], axis=-1)
            .reshape(*a.shape[:-1], n), lo, hi)

    return jax.lax.fori_loop(0, log_n, body, v)


def ntt_dit(v, root: int):
    """DIT butterfly network: bit-reversed input -> natural output.
    Constant-geometry inverse of ntt_dif's stages (see there)."""
    n = gf.shape(v)[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return v
    W = gf.from_u64(_twiddle_table(n, root))

    def body(i, v):
        s = log_n - 1 - i
        lo = gf.tmap(lambda a: a[..., 0::2], v)
        hi = gf.tmap(lambda a: a[..., 1::2], v)
        w = gf.tmap(lambda a: a[s], W)
        tv = gf.mul(hi, w)
        return gf.tmap(lambda a, b: jnp.concatenate([a, b], axis=-1),
                       gf.add(lo, tv), gf.sub(lo, tv))

    return jax.lax.fori_loop(0, log_n, body, v)


@functools.partial(jax.jit, static_argnums=(1,))
def coeffs_bitrev_from_values(values, offset: int = 1):
    """Interpolate: values on the coset offset*<omega_n> (natural order)
    -> polynomial coefficients in BIT-REVERSED order."""
    n = gf.shape(values)[-1]
    if n == 1:
        return values
    root_inv = bfe.inv(bfe.primitive_root_of_unity(n))
    c = ntt_dif(values, root_inv)
    n_inv = bfe.inv(n % P)
    if offset == 1:
        return gf.mul_const(c, n_inv)
    # coefficient i gets offset^-i / n, laid out in bitrev order
    scale = _powers(bfe.inv(offset), n.bit_length() - 1, bitrev=True)
    return gf.mul(c, gf.mul_const(scale, n_inv))


@functools.partial(jax.jit, static_argnums=(1,))
def values_from_coeffs_bitrev(coeffs_br, offset: int = 1):
    """Evaluate: coefficients in BIT-REVERSED order -> values on the coset
    offset*<omega_n> in natural order."""
    n = gf.shape(coeffs_br)[-1]
    if n == 1:
        return coeffs_br
    if offset != 1:
        scale = _powers(offset, n.bit_length() - 1, bitrev=True)
        coeffs_br = gf.mul(coeffs_br, scale)
    root = bfe.primitive_root_of_unity(n)
    return ntt_dit(coeffs_br, root)


def pad_coeffs_bitrev(coeffs_br, new_len: int):
    """Zero-extend a bit-reversed coefficient vector from n to new_len.

    rev_M(j) = (M/n)*rev_n(j) for j < n, so the padded bitrev layout is the
    old one at stride M/n: a pure reshape+pad, no gather."""
    n = gf.shape(coeffs_br)[-1]
    stride = new_len // n
    if stride == 1:
        return coeffs_br
    batch = gf.shape(coeffs_br)[:-1]

    def expand(x):
        y = x[..., None]
        pad = [(0, 0)] * (y.ndim - 1) + [(0, stride - 1)]
        return jnp.pad(y, pad).reshape(*batch, new_len)

    return gf.tmap(expand, coeffs_br)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def lde(values, expansion: int, in_offset: int = 1, out_offset: int = 7):
    """Low-degree extension: values on coset in_offset*<omega_n> ->
    values on coset out_offset*<omega_{expansion*n}> (natural order).

    Mirrors ArithmeticDomain::low_degree_extension
    (/root/reference/triton-vm/src/arithmetic_domain.rs:203-212)."""
    c = coeffs_bitrev_from_values(values, in_offset)
    c = pad_coeffs_bitrev(c, gf.shape(values)[-1] * expansion)
    return values_from_coeffs_bitrev(c, out_offset)


@functools.partial(jax.jit, static_argnums=(1,))
def ntt(coeffs, offset: int = 1):
    """Plain forward NTT of natural-order coefficients -> natural-order
    values on offset*<omega_n>. Needs one bit-reversal gather."""
    n = gf.shape(coeffs)[-1]
    if n == 1:
        return coeffs
    br = bitrev_indices(n)
    return values_from_coeffs_bitrev(gf.take(coeffs, br, axis=-1), offset)


@functools.partial(jax.jit, static_argnums=(1,))
def intt(values, offset: int = 1):
    """Inverse NTT: natural-order values -> natural-order coefficients."""
    n = gf.shape(values)[-1]
    if n == 1:
        return values
    br = bitrev_indices(n)
    return gf.take(coeffs_bitrev_from_values(values, offset), br, axis=-1)


@functools.lru_cache(maxsize=None)
def bitrev_indices(n: int):
    """Bit-reversal permutation as a host numpy array (safe to cache across
    jit traces; jnp arrays here would leak tracers)."""
    import numpy as np

    log_n = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


# ---------------------------------------------------------------- XFE layer

def xfe_map(fn, v, *args, **kwargs):
    """Apply a gf transform along each of the 3 XFE coefficients."""
    return tuple(fn(v[i], *args, **kwargs) for i in range(3))
