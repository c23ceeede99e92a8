"""Jitted device kernels for the prover's vector algebra.

Each function here is a `jax.jit` entry point over gf/gfx pytrees (see
ops/gf.py for the (lo, hi) uint32 representation). Keeping these jitted
matters on the TPU platform: eager per-op dispatch costs milliseconds to
seconds per call, while one fused graph runs the whole vector expression
in a single dispatch.

Reference semantics: stark.rs DEEP codewords and quotient-segment
randomization, master_table.rs weighted column sums and out-of-domain
rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import gf, gfx


@jax.jit
def xfe_scale_poly(v, factor):
    """coeff_j <- factor_j * coeff_j; v: gfx (n,), factor: gf (n,)."""
    return gfx.bfe_mul(v, factor)


@jax.jit
def xfe_scalar_mul(v, w):
    """w * v for gfx v (n,) and gfx scalar w ()."""
    return gfx.mul(v, w)


@jax.jit
def xfe_axpy(acc, w, v):
    """acc + w * v (gfx; w scalar)."""
    return gfx.add(acc, gfx.mul(v, w))


@jax.jit
def deep_codeword(cw, xs, point, value):
    """(cw - value) / (lift(xs) - point); cw gfx (n,), xs gf (n,),
    point/value gfx scalars ()."""
    num = gfx.sub(cw, value)
    n = gf.shape(xs)[0]
    p0, p1, p2 = point
    den = (gf.sub(xs, p0),
           gf.broadcast_to(gf.neg(p1), (n,)),
           gf.broadcast_to(gf.neg(p2), (n,)))
    inv = gfx.inv(den)  # elementwise Fermat/Frobenius: scan-free
    return gfx.mul(num, inv)


def _sum0(v):
    """Tree-sum a gf pair over axis 0."""
    K = gf.shape(v)[0]
    Kp = 1 << max(K - 1, 0).bit_length()
    if Kp != K:
        pad = ((0, Kp - K),) + ((0, 0),) * (len(gf.shape(v)) - 1)
        v = gf.tmap(lambda a: jnp.pad(a, pad), v)
    while Kp > 1:
        half = Kp // 2
        v = gf.add(gf.tmap(lambda a: a[:half], v),
                   gf.tmap(lambda a: a[half:], v))
        Kp = half
    return gf.tmap(lambda a: a[0], v)


def gf_sum0(v):
    return _sum0(v)


@jax.jit
def weighted_column_sum(main_cols, aux_cols, w_main, w_aux):
    """sum_i w_main[i] * main_cols[i, :] + sum_j w_aux[j] * aux_cols[j, :].

    main_cols: gf (num_main, n); aux_cols: gfx (num_aux, n);
    w_main: gfx (num_main,); w_aux: gfx (num_aux,). Returns gfx (n,).
    (master_table.rs weighted_sum_of_columns)"""
    out = []
    wm = gfx.tmap(lambda a: a[:, None], w_main)
    for c in range(3):
        out.append(_sum0(gf.mul(main_cols, wm[c])))
    wa = gfx.tmap(lambda a: a[:, None], w_aux)
    prod = gfx.mul(aux_cols, wa)
    return tuple(gf.add(out[c], _sum0(prod[c])) for c in range(3))


@jax.jit
def ood_column_dot(main_cols, aux_cols, dods):
    """Barycentric numerators: for every column, sum_r dods[r] * col[r].

    main_cols: gf (num_main, h); aux_cols: gfx (num_aux, h);
    dods: gfx (h,). Returns (gfx (num_main,), gfx (num_aux,))."""
    main_out = tuple(_gf_dot_rows(main_cols, dods[c]) for c in range(3))
    prod = gfx.mul(aux_cols, gfx.tmap(lambda a: a[None, :], dods))
    aux_out = tuple(_sum_axis1(prod[c]) for c in range(3))
    return main_out, aux_out


def _gf_dot_rows(cols, w_row):
    """cols: gf (m, h); w_row: gf (h,) -> gf (m,)."""
    return _sum_axis1(gf.mul(cols, gf.tmap(lambda a: a[None, :], w_row)))


def _sum_axis1(v):
    """Tree-sum a gf pair over axis 1."""
    K = gf.shape(v)[1]
    Kp = 1 << max(K - 1, 0).bit_length()
    if Kp != K:
        pad = ((0, 0), (0, Kp - K)) + ((0, 0),) * (len(gf.shape(v)) - 2)
        v = gf.tmap(lambda a: jnp.pad(a, pad), v)
    while Kp > 1:
        half = Kp // 2
        v = gf.add(gf.tmap(lambda a: a[:, :half], v),
                   gf.tmap(lambda a: a[:, half:], v))
        Kp = half
    return gf.tmap(lambda a: a[:, 0], v)


@jax.jit
def ood_shift_inverses(ds, alpha):
    """dods[r] = ds[r] / (alpha - ds[r]); ds gf (h,), alpha gfx ().
    Also returns denom = sum_r dods[r] (barycentric denominator)."""
    h = gf.shape(ds)[0]
    a0, a1, a2 = alpha
    shifts = (gf.sub(gf.broadcast_to(a0, (h,)), ds),
              gf.broadcast_to(a1, (h,)),
              gf.broadcast_to(a2, (h,)))
    inv = gfx.inv(shifts)  # elementwise: scan-free
    dods = gfx.bfe_mul(inv, ds)
    denom = tuple(_sum0(dods[c]) for c in range(3))
    return dods, denom


@jax.jit
def xfe_add_vec(a, b):
    return gfx.add(a, b)
