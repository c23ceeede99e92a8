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

import functools

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


def _domain_powers(generator: int, offset: int, n: int):
    """gf (n,) of offset * generator^i, built from host ints (becomes an
    XLA constant-folded log-depth concat, no host->device transfer)."""
    v = gf.ones((1,))
    log_n = n.bit_length() - 1
    for t in range(log_n):
        c = pow(generator, 1 << t, 0xFFFFFFFF00000001)
        v = gf.concatenate([v, gf.mul_const(v, c)], axis=-1)
    return gf.mul_const(v, offset) if offset != 1 else v


def _bary_eval_at(cols_gf, cols_gfx, xs, point):
    """Barycentric evaluation of every column's interpolant at an
    out-of-domain XFE `point` (master_table.rs:348-390 semantics via the
    committed codewords: the randomized interpolant IS the codeword's
    interpolant, so the barycentric formula over the full evaluation
    domain yields the identical field element).

    cols_gf: gf (m, n) or None; cols_gfx: gfx (k, n) or None; xs gf (n,);
    point gfx (). Returns (gfx (m,), gfx (k,))."""
    dods, denom = ood_shift_inverses(xs, point)
    dinv = gfx.inv(denom)
    out_gf = out_gfx = None
    if cols_gf is not None:
        num = tuple(_gf_dot_rows(cols_gf, dods[c]) for c in range(3))
        out_gf = gfx.mul(num, dinv)
    if cols_gfx is not None:
        prod = gfx.mul(cols_gfx, gfx.tmap(lambda a: a[None, :], dods))
        num = tuple(_sum_axis1(prod[c]) for c in range(3))
        out_gfx = gfx.mul(num, dinv)
    return out_gf, out_gfx


@functools.lru_cache(maxsize=8)
def ood_stage_fn(E: int, L: int, e_gen: int, e_off: int, l_gen: int,
                 l_off: int):
    """One-dispatch out-of-domain stage (stark.rs:520-560):
    randomized main/aux rows at alpha and omega*alpha (via barycentric
    over the committed codewords) plus all 5 quotient-segment evaluations
    at alpha^k and (zeta*alpha)^k.

    fn(main_lde (NM,E) gf, aux_lde (NA,E) gfx, segs (5,L) gfx,
       alpha, omega_alpha, apk, zapk: gfx scalars)
    -> (main@alpha, aux@alpha, main@omega_alpha, aux@omega_alpha,
        segs@apk, segs@zapk) as gfx vectors."""

    def fn(main_lde, aux_lde, segs_in, alpha, omega_alpha, apk, zapk):
        segs = tuple(gf.stack([s[c] for s in segs_in], axis=0)
                     for c in range(3))
        xs_e = _domain_powers(e_gen, e_off, E)
        xs_l = _domain_powers(l_gen, l_off, L)
        m1, a1 = _bary_eval_at(main_lde, aux_lde, xs_e, alpha)
        m2, a2 = _bary_eval_at(main_lde, aux_lde, xs_e, omega_alpha)
        _, s1 = _bary_eval_at(None, segs, xs_l, apk)
        _, s2 = _bary_eval_at(None, segs, xs_l, zapk)
        return m1, a1, m2, a2, s1, s2

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def deep_combination_fn(S: int, L: int, s_gen: int, s_off: int, l_off: int,
                        stride_ma: int, stride_seg: int):
    """One-dispatch DEEP combination codeword (stark.rs:560-644):

    - weighted sum of all committed main/aux codewords (on the short
      domain, i.e. the eval domain strided by `stride_ma`),
    - the two weighted quotient-segment codewords (zeta-chain p/r split),
    - the four DEEP codewords (cw - ood_value) / (x - ood_point),
    - their weighted sum, low-degree extended from the short domain to
      the FRI domain when S != L.

    fn(main_lde, aux_lde, segs, w_main gfx (NM,), w_aux, w_qs (5,),
       w_deep (4,), points gfx (4,), values gfx (4,)) -> gfx (L,)."""
    from . import ntt

    def fn(main_lde, aux_lde, segs_in, w_main, w_aux, w_qs, w_deep,
           points, values):
        segs = tuple(gf.stack([s[c] for s in segs_in], axis=0)
                     for c in range(3))
        ms = (gf.tmap(lambda a: a[:, ::stride_ma], main_lde)
              if stride_ma != 1 else main_lde)
        axs = (gfx.tmap(lambda a: a[:, ::stride_ma], aux_lde)
               if stride_ma != 1 else aux_lde)
        ss = (gfx.tmap(lambda a: a[:, ::stride_seg], segs)
              if stride_seg != 1 else segs)
        xs_s = _domain_powers(s_gen, s_off, S)

        cw_ma = weighted_column_sum(ms, axs, w_main, w_aux)
        seg_w = gfx.mul(ss, gfx.tmap(lambda a: a[:, None], w_qs))
        shared = tuple(_sum0(gfx.tmap(lambda a: a[1:4], seg_w)[c])
                       for c in range(3))
        cw_p = gfx.add(shared, gfx.tmap(lambda a: a[0], seg_w))
        cw_r = gfx.add(shared, gfx.tmap(lambda a: a[4], seg_w))

        comb = gfx.zeros((S,))
        for i, cw in enumerate((cw_ma, cw_ma, cw_p, cw_r)):
            pt = gfx.tmap(lambda a: a[i], points)
            v = gfx.tmap(lambda a: a[i], values)
            dc = deep_codeword(cw, xs_s, pt, v)
            comb = gfx.add(comb, gfx.mul(dc, gfx.tmap(lambda a: a[i],
                                                      w_deep)))
        if S != L:
            c_br = tuple(ntt.coeffs_bitrev_from_values(comb[c], s_off)
                         for c in range(3))
            c_br = tuple(ntt.pad_coeffs_bitrev(c, L) for c in c_br)
            comb = tuple(ntt.values_from_coeffs_bitrev(c, l_off)
                         for c in c_br)
        return comb

    return jax.jit(fn)
