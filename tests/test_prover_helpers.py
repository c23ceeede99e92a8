"""Differential tests: device/vectorized prover helpers vs the original
scalar host implementations (bit-identity)."""

import numpy as np
from triton_vm_tpu.fields import bfe, poly, xfe
from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.stark.arithmetic_domain import Domain
from triton_vm_tpu.stark import prover as pr
from triton_vm_tpu.ops import gf, gfx, ntt

rng = np.random.default_rng(5)
def rnd_xfe_list(n):
    a = rng.integers(0, P, size=(n,3), dtype=np.uint64)
    return [tuple(int(c) for c in r) for r in a]

# ---- original implementations (from git HEAD) --------------------------
def eval_xfe_poly_on_domain_OLD(coeffs, domain):
    n = domain.length
    coeffs = poly.trim(coeffs, xfe) or [xfe.ZERO]
    values = [xfe.ZERO] * n
    for k in range(0, len(coeffs), n):
        chunk = coeffs[k:k + n]
        chunk = chunk + [xfe.ZERO] * (n - len(chunk))
        arr = np.array(chunk, np.uint64)
        ev = gfx.to_u64(ntt.xfe_map(ntt.ntt, gfx.from_u64(arr), domain.offset))
        scale = pow(domain.offset, k, P)
        for i in range(n):
            e = tuple(int(c) for c in ev[i])
            if scale != 1:
                e = xfe.bfe_mul(e, scale)
            values[i] = xfe.add(values[i], e)
    return values

def batch_inv_xfe(values):
    n = len(values)
    prefix = [xfe.ONE] * (n + 1)
    for i, v in enumerate(values):
        prefix[i + 1] = xfe.mul(prefix[i], v)
    acc = xfe.inv(prefix[n])
    out = [None] * n
    for i in range(n - 1, -1, -1):
        out[i] = xfe.mul(prefix[i], acc)
        acc = xfe.mul(acc, values[i])
    return out

def deep_codeword_OLD(codeword, domain, ood_point, ood_value):
    xs = domain.values()
    denoms = [xfe.sub(xfe.lift(x), ood_point) for x in xs]
    inv = batch_inv_xfe(denoms)
    return [xfe.mul(xfe.sub(v, ood_value), iv) for v, iv in zip(codeword, inv)]

def ood_row_OLD(columns_, rand_polys, trace_dom, alpha, lift):
    ds = trace_dom.values()
    shifts = [xfe.sub(alpha, xfe.lift(d)) for d in ds]
    shift_invs = batch_inv_xfe(shifts)
    dods = [xfe.bfe_mul(inv, d) for d, inv in zip(ds, shift_invs)]
    denom = xfe.ZERO
    for v in dods: denom = xfe.add(denom, v)
    denom_inv = xfe.inv(denom)
    z = trace_dom.zerofier_at(alpha)
    out = []
    for col, rand in zip(columns_, rand_polys):
        num = xfe.ZERO
        if lift:
            for c, w in zip(col, dods): num = xfe.add(num, xfe.bfe_mul(w, c))
        else:
            for c, w in zip(col, dods): num = xfe.add(num, xfe.mul(w, c))
        r_at = xfe.ZERO
        for c in reversed(rand):
            c_x = c if isinstance(c, tuple) else xfe.lift(c)
            r_at = xfe.add(xfe.mul(r_at, alpha), c_x)
        out.append(xfe.add(xfe.mul(num, denom_inv), xfe.mul(z, r_at)))
    return out

def weighted_sum_OLD(main, aux, main_rand, aux_rand, trace_dom, w_main, w_aux):
    h = main.shape[0]
    main_obj = main.astype(object)
    aux_obj = [aux[:, :, c].astype(object) for c in range(3)]
    acc = tuple(np.zeros(h, object) for _ in range(3))
    for i in range(main.shape[1]):
        w = w_main[i]; col = main_obj[:, i]
        acc = tuple((acc[c] + col * w[c]) % P for c in range(3))
    for j in range(aux.shape[1]):
        w = w_aux[j]
        col = tuple(aux_obj[c][:, j] for c in range(3))
        prod = pr._xmul_obj(col, tuple(np.array(c, object) for c in w))
        acc = tuple((acc[c] + prod[c]) % P for c in range(3))
    values = [tuple(int(acc[c][r]) for c in range(3)) for r in range(h)]
    trace_poly = [tuple(int(c) for c in row) for row in
                  pr._interp_xfe_codeword_arr(
                      np.array(values, np.uint64), trace_dom)]
    rand_sum = [xfe.ZERO] * max(len(main_rand[0]), 1)
    for i, rc in enumerate(main_rand):
        w = w_main[i]
        for k, c in enumerate(rc):
            rand_sum[k] = xfe.add(rand_sum[k], xfe.bfe_mul(w, c))
    for j, rc in enumerate(aux_rand):
        w = w_aux[j]
        for k, c in enumerate(rc):
            rand_sum[k] = xfe.add(rand_sum[k], xfe.mul(w, tuple(c)))
    off_h = pow(trace_dom.offset, h, P)
    shifted = [xfe.ZERO] * h + rand_sum
    scaled = [xfe.bfe_mul(c, off_h) for c in rand_sum]
    contribution = poly.sub(shifted, scaled, xfe)
    return poly.add(trace_poly, contribution, xfe)



def test_vectorized_helpers_match_scalar_reference():

    dom = Domain(64, 7)
    big = Domain(256, 7)

    # 1. eval poly on domain (incl. multi-chunk)
    for ln in (17, 64, 130, 256):
        cl = rnd_xfe_list(ln)
        old = eval_xfe_poly_on_domain_OLD(list(cl), dom)
        new = pr._eval_xfe_poly_on_domain(list(cl), dom)
        assert old == new, f"eval mismatch at len {ln}"

    # 2. scale poly
    cl = rnd_xfe_list(40)
    s, mc = 12345, 6789
    old = poly.scalar_mul(poly.scale(list(cl), xfe.lift(s), xfe), xfe.lift(mc), xfe)
    new = pr._xfe_scale_poly_arr(np.array(cl, np.uint64), s, mc)
    new_l = [tuple(int(c) for c in r) for r in new]
    assert old == new_l

    # 3. scalar mul
    w = rnd_xfe_list(1)[0]
    old = poly.scalar_mul(list(cl), w, xfe)
    new = pr._xfe_scalar_mul_arr(np.array(cl, np.uint64), w)
    new_l = [tuple(int(c) for c in r) for r in new]
    assert old == new_l

    # 4. deep codeword
    cw = rnd_xfe_list(64)
    pt, val = rnd_xfe_list(1)[0], rnd_xfe_list(1)[0]
    old = deep_codeword_OLD(cw, dom, pt, val)
    new = pr._deep_codeword_arr(np.array(cw, np.uint64), dom, pt, val)
    new_l = [tuple(int(c) for c in r) for r in new]
    assert old == new_l

    # 5. weighted sum of columns
    h, nm, na, ntr = 32, 7, 5, 9
    main = rng.integers(0, P, size=(h, nm), dtype=np.uint64)
    aux = rng.integers(0, P, size=(h, na, 3), dtype=np.uint64)
    main_rand = [[int(x) for x in rng.integers(0, P, ntr, dtype=np.uint64)] for _ in range(nm)]
    aux_rand = [[tuple(int(c) for c in r) for r in rng.integers(0, P, (ntr,3), dtype=np.uint64)] for _ in range(na)]
    w_main, w_aux = rnd_xfe_list(nm), rnd_xfe_list(na)
    tdom = Domain(h)
    old = weighted_sum_OLD(main, aux, main_rand, aux_rand, tdom, w_main, w_aux)
    new = pr._weighted_sum_of_columns(main, aux, main_rand, aux_rand, tdom, w_main, w_aux)
    new_l = [tuple(int(c) for c in r) for r in new]
    old_t = poly.trim(list(old), xfe)
    new_t = poly.trim(new_l, xfe)
    assert old_t == new_t
    if False:
        for i,(a,b) in enumerate(zip(old_t, new_t)):
            if a != b: print("first diff at", i, a, b); break
        print("lens", len(old_t), len(new_t))

    # 6. OOD rows
    alpha = rnd_xfe_list(1)[0]
    cols_m = [[int(v) for v in main[:, i]] for i in range(nm)]
    rand_m = [[xfe.lift(int(c)) for c in rc] for rc in main_rand]
    old_m = ood_row_OLD(cols_m, rand_m, tdom, alpha, lift=True)
    cols_a = [[tuple(int(c) for c in aux[j, i]) for j in range(h)] for i in range(na)]
    rand_a = [[tuple(c) for c in rc] for rc in aux_rand]
    old_a = ood_row_OLD(cols_a, rand_a, tdom, alpha, lift=False)
    new_m, new_a = pr._ood_rows(main, aux, main_rand, aux_rand, tdom, alpha)
    assert old_m == new_m
    assert old_a == new_a



def test_chunked_quotients_match_unchunked(monkeypatch):
    """Row-tiled quotient evaluation (HBM bound at Q >= 2^18) is
    bit-identical to the single-dispatch path."""
    from triton_vm_tpu.air.challenges import SAMPLE_COUNT, Challenges
    from triton_vm_tpu.air.master import master_air
    from triton_vm_tpu.stark.proof_stream import Claim

    num_constraints = sum(
        len(cs) for cs in master_air().constraints.values())
    weights = pr._powers_xfe((3, 1, 4), num_constraints)
    claim = Claim((0,) * 5, [], [])
    challenges = Challenges(
        [tuple(int(c) for c in row) for row in
         rng.integers(0, P, size=(SAMPLE_COUNT, 3), dtype=np.uint64)],
        claim)
    trace_dom, quot_dom = Domain(64), Domain(256, 7)
    main = rng.integers(0, P, (pr.NUM_MAIN, 256), dtype=np.uint64)
    aux = np.stack([rng.integers(0, P, (pr.NUM_AUX, 256), dtype=np.uint64)
                    for _ in range(3)])
    want = pr._all_quotients_combined_device(
        main, aux, trace_dom, quot_dom, challenges, weights)
    monkeypatch.setattr(pr, "_QUOTIENT_CHUNK_ROWS", 64)
    got = pr._all_quotients_combined_device(
        main, aux, trace_dom, quot_dom, challenges, weights)
    assert np.array_equal(want, got)
