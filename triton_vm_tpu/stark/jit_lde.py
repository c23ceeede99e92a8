"""Just-in-time (memory-light) LDE mode.

Re-designs the reference's cache-or-JIT trade
(master_table.rs:258-322 `maybe_low_degree_extend_all_columns`,
stark.rs:880-980 coset-looped JIT quotients) for TPU HBM limits: instead
of materializing the (num_cols, |LDT domain|) committed codewords, the
evaluation domain is processed as `m` cosets of the randomized-trace
subgroup. Each coset is one device dispatch producing only that coset's
row digests (for commitment) or quotient values; peak memory drops from
O(num_cols * E) to O(num_cols * n) where n = |randomized trace domain|.

Key facts making the tiling exact:
- eval-domain points with index === t (mod m) form the coset
  psi * g^t * <g^m>, where g generates the length-E subgroup and g^m has
  order n; evaluating there is a plain length-n NTT of the coefficients
  pre-scaled by the coset offset's power ladder.
- the transition-constraint "next row" lies `unit = Q/h` positions ahead
  globally; since unit is a multiple of m (n >= h), the shift stays
  INSIDE a coset (a roll by unit/m positions), so quotient tapes run
  per-coset without halo exchange.
- the trace-domain zerofier on a coset is c*(-1)^j - 1 with
  c = offset^h, since (g^m)^(j*h) = (-1)^j for n = 2h.

Row openings in this mode use batched barycentric evaluation from the
trace table (master_table.rs:548-609 "multipoint extrapolation").
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.bfe import P
from ..ops import gf, gfx, ntt, tip5_kernel

NUM_MAIN = 379
NUM_AUX = 91


def _powers_ladder(base: int, n: int, scale: int = 1) -> np.ndarray:
    out = np.empty(n, np.uint64)
    acc = scale % P
    for i in range(n):
        out[i] = acc
        acc = acc * base % P
    return out


@functools.lru_cache(maxsize=8)
def _coset_commit_bfe_fn(n, ntr, nc):
    """Per-coset committed-value digests: one jit, coset offset passed as
    a runtime power ladder so all m cosets share the compilation."""
    import jax
    import jax.numpy as jnp

    def fn(coeffs, rand, offvec, zvals):
        scaled = gf.mul(coeffs, gf.tmap(lambda a: a[None, :], offvec))
        values = ntt.ntt(scaled, 1)
        rand_full = gf.tmap(
            lambda a: jnp.zeros((nc, n), jnp.uint32).at[:, :ntr].set(a),
            rand)
        rscaled = gf.mul(rand_full, gf.tmap(lambda a: a[None, :], offvec))
        rvalues = ntt.ntt(rscaled, 1)
        committed = gf.add(values, gf.mul(
            gf.tmap(lambda a: a[None, :], zvals), rvalues))
        rows = gf.tmap(lambda a: a.T, committed)
        return committed, tip5_kernel.sponge_absorb_rows(rows)

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _coset_commit_xfe_fn(n, ntr, nc):
    import jax
    import jax.numpy as jnp

    def fn(coeffs3, rand3, offvec, zvals):
        off = gf.tmap(lambda a: a[None, :], offvec)
        z = gf.tmap(lambda a: a[None, :], zvals)
        comps = []
        for c in range(3):
            values = ntt.ntt(gf.mul(coeffs3[c], off), 1)
            rand_full = gf.tmap(
                lambda a: jnp.zeros((nc, n), jnp.uint32).at[:, :ntr].set(a),
                rand3[c])
            rvalues = ntt.ntt(gf.mul(rand_full, off), 1)
            comps.append(gf.add(values, gf.mul(z, rvalues)))
        committed = tuple(comps)
        rows = tuple(
            jnp.stack([committed[c][p].T for c in range(3)], axis=2)
            .reshape(n, nc * 3) for p in range(2))
        return committed, tip5_kernel.sponge_absorb_rows(rows)

    return jax.jit(fn)


def _coset_offsets_and_zerofiers(eval_dom, n, h, trace_offset=1):
    """Per-coset (offset ladder, zerofier values) as numpy arrays."""
    E = eval_dom.length
    m = E // n
    g = eval_dom.generator
    tiles = []
    off_h_trace = pow(trace_offset, h, P)
    for t in range(m):
        coset_offset = eval_dom.offset * pow(g, t, P) % P
        ladder = _powers_ladder(coset_offset, n)
        c = pow(coset_offset, h, P)
        j = np.arange(n)
        zv = np.where(j % 2 == 0, c, P - c).astype(np.uint64)
        zv = (zv.astype(object) - off_h_trace) % P
        tiles.append((ladder, zv.astype(np.uint64)))
    return tiles


@functools.lru_cache(maxsize=8)
def _interp_pad_bfe_fn(h, n):
    import jax
    import jax.numpy as jnp

    def fn(cols):  # gf (nc, h) trace values -> (nc, n) coefficients
        coeffs = ntt.intt(cols, 1)
        return gf.tmap(lambda a: jnp.pad(a, ((0, 0), (0, n - h))), coeffs)

    return jax.jit(fn)


def interpolate_columns_bfe(cols, n):
    """Trace-domain values gf (nc, h) -> interpolant coefficients gf
    (nc, n), zero-padded to the randomized-trace length n."""
    h = gf.shape(cols)[-1]
    return _interp_pad_bfe_fn(h, n)(cols)


def interpolate_columns_xfe(cols3, n):
    return tuple(interpolate_columns_bfe(c, n) for c in cols3)


def committed_digests_bfe(table_coeffs, rand, eval_dom, ldt_len, h, ntr):
    """Digest row (5, L) of the committed main-table codeword, computed
    coset-by-coset. table_coeffs: gf (nc, n) trace-interpolant coefficients
    zero-padded to the randomized length n; rand: gf (nc, ntr)."""
    nc = gf.shape(table_coeffs)[0]
    n = gf.shape(table_coeffs)[-1]
    E = eval_dom.length
    m = E // n
    stride_ldt = E // ldt_len
    fn = _coset_commit_bfe_fn(n, ntr, nc)
    digests = np.zeros((5, ldt_len), np.uint64)
    for t, (ladder, zvals) in enumerate(
            _coset_offsets_and_zerofiers(eval_dom, n, h)):
        _, dg = fn(table_coeffs, rand, gf.from_u64(ladder),
                   gf.from_u64(zvals))
        # coset t holds global indices t, t+m, ...; keep the LDT subset
        if stride_ldt == 1:
            digests[:, t::m] = gf.to_u64(dg)
        elif t % stride_ldt == 0:
            digests[:, (t // stride_ldt)::(m // stride_ldt)] = gf.to_u64(dg)
    return digests


def committed_digests_xfe(table_coeffs3, rand3, eval_dom, ldt_len, h, ntr):
    """Digest rows (5, L) of the committed aux-table codeword, computed
    coset-by-coset. table_coeffs3: 3-tuple of gf (nc, n); rand3 same."""
    nc = gf.shape(table_coeffs3[0])[0]
    n = gf.shape(table_coeffs3[0])[-1]
    E = eval_dom.length
    m = E // n
    stride_ldt = E // ldt_len
    fn = _coset_commit_xfe_fn(n, ntr, nc)
    digests = np.zeros((5, ldt_len), np.uint64)
    for t, (ladder, zvals) in enumerate(
            _coset_offsets_and_zerofiers(eval_dom, n, h)):
        _, dg = fn(table_coeffs3, rand3, gf.from_u64(ladder),
                   gf.from_u64(zvals))
        if stride_ldt == 1:
            digests[:, t::m] = gf.to_u64(dg)
        elif t % stride_ldt == 0:
            digests[:, (t // stride_ldt)::(m // stride_ldt)] = gf.to_u64(dg)
    return digests


def reveal_rows_bfe(table_coeffs, rand, eval_dom, ldt_len, h, ntr, indices):
    """Committed main-table rows at the given LDT indices, (k, nc) u64,
    recomputed coset-by-coset without a cached LDE."""
    nc = gf.shape(table_coeffs)[0]
    n = gf.shape(table_coeffs)[-1]
    E = eval_dom.length
    m = E // n
    stride_ldt = E // ldt_len
    fn = _coset_commit_bfe_fn(n, ntr, nc)
    out = np.zeros((len(indices), nc), np.uint64)
    tiles = _coset_offsets_and_zerofiers(eval_dom, n, h)
    by_coset = {}
    for pos, idx in enumerate(indices):
        g_idx = idx * stride_ldt  # global eval-domain index
        by_coset.setdefault(g_idx % m, []).append((pos, g_idx // m))
    for t, entries in sorted(by_coset.items()):
        ladder, zvals = tiles[t]
        committed, _ = fn(table_coeffs, rand, gf.from_u64(ladder),
                          gf.from_u64(zvals))
        rows = np.array([r for _, r in entries], np.int64)
        sel = gf.to_u64(gf.take(committed, rows, axis=1))  # (nc, len)
        for j, (pos, _) in enumerate(entries):
            out[pos] = sel[:, j]
    return out


def reveal_rows_xfe(table_coeffs3, rand3, eval_dom, ldt_len, h, ntr,
                    indices):
    """Committed aux-table rows at the given LDT indices, (k, nc, 3)."""
    nc = gf.shape(table_coeffs3[0])[0]
    n = gf.shape(table_coeffs3[0])[-1]
    E = eval_dom.length
    m = E // n
    stride_ldt = E // ldt_len
    fn = _coset_commit_xfe_fn(n, ntr, nc)
    out = np.zeros((len(indices), nc, 3), np.uint64)
    tiles = _coset_offsets_and_zerofiers(eval_dom, n, h)
    by_coset = {}
    for pos, idx in enumerate(indices):
        g_idx = idx * stride_ldt
        by_coset.setdefault(g_idx % m, []).append((pos, g_idx // m))
    for t, entries in sorted(by_coset.items()):
        ladder, zvals = tiles[t]
        committed, _ = fn(table_coeffs3, rand3, gf.from_u64(ladder),
                          gf.from_u64(zvals))
        rows = np.array([r for _, r in entries], np.int64)
        sel = [gf.to_u64(gf.take(committed[c], rows, axis=1))
               for c in range(3)]  # 3 x (nc, len)
        for j, (pos, _) in enumerate(entries):
            for c in range(3):
                out[pos, :, c] = sel[c][:, j]
    return out


def quotient_codeword_jit(main_coeffs, aux_coeffs, main_rand, aux_rand,
                          trace_dom, quot_dom, challenges, quot_weights,
                          ntr):
    """All-quotients codeword over the quotient domain, one coset at a
    time (stark.rs:880-980 P6). Returns numpy (Q, 3)."""
    from ..air.master import master_air
    from .prover import _quotient_fn
    from ..fields import bfe

    air = master_air()
    h = trace_dom.length
    n = gf.shape(main_coeffs)[-1]
    Q = quot_dom.length
    m = Q // n
    unit = Q // h
    assert unit % m == 0, "next-row shift must stay inside a coset"

    ch_u = np.array(challenges.challenges, np.uint64)
    ch = tuple(gf.from_u64(ch_u[:, c]) for c in range(3))
    w = np.array(quot_weights, np.uint64)
    ws, off = [], 0
    for ph in ("init", "cons", "tran", "term"):
        k = len(air.constraints[ph])
        ws.append(tuple(gf.from_u64(w[off:off + k][:, c])
                        for c in range(3)))
        off += k
    gen_inv = bfe.inv(trace_dom.generator)

    cfn_b = _coset_commit_bfe_fn(n, ntr, NUM_MAIN)
    cfn_x = _coset_commit_xfe_fn(n, ntr, NUM_AUX)
    from .prover import _QUOTIENT_CHUNK_ROWS, _quotient_chunk_fn

    chunked = n > _QUOTIENT_CHUNK_ROWS
    qfn = (None if chunked
           else _quotient_fn(n, unit // m, h, gen_inv))

    out = np.zeros((Q, 3), np.uint64)
    for t, (ladder, zvals) in enumerate(
            _coset_offsets_and_zerofiers(quot_dom, n, h)):
        lv, zv = gf.from_u64(ladder), gf.from_u64(zvals)
        main_c, _ = cfn_b(main_coeffs, main_rand, lv, zv)
        aux_c, _ = cfn_x(aux_coeffs, aux_rand, lv, zv)
        xs = gf.from_u64(_powers_ladder(
            pow(quot_dom.generator, m, P), n,
            quot_dom.offset * pow(quot_dom.generator, t, P) % P))
        if chunked:
            # the tape value banks are O(num_constraints x rows) HBM:
            # (403, 2^19) XFE temps OOMed a 15.75 GB chip at h = 2^18 —
            # evaluate the coset in row chunks like the cached path
            C = _QUOTIENT_CHUNK_ROWS
            cq = _quotient_chunk_fn(h, gen_inv)
            parts = []
            for s in range(0, n, C):
                idx = np.arange(s, s + C, dtype=np.int64)
                nidx = (idx + unit // m) % n
                parts.append(cq(
                    gf.take(main_c, idx, axis=1),
                    tuple(gf.take(aux_c[c], idx, axis=1)
                          for c in range(3)),
                    gf.take(main_c, nidx, axis=1),
                    tuple(gf.take(aux_c[c], nidx, axis=1)
                          for c in range(3)),
                    ch, tuple(ws), gf.take(xs, idx)))
            acc = tuple(gf.concatenate([p[c] for p in parts], axis=0)
                        for c in range(3))
        else:
            acc = qfn(main_c, aux_c, ch, tuple(ws), xs)
        vals = np.stack([gf.to_u64(acc[c]) for c in range(3)], axis=1)
        out[t::m] = vals
    return out
