"""Device aux-table extension (SURVEY.md §2.5 P10, partial).

The reference computes every aux column as a sequential prefix scan over
rows (running evaluations, running products, log-derivative sums — e.g.
table/program.rs:205-264, table/lookup.rs:27-82). All of these updates
are associative, so on TPU they become log-depth `associative_scan`s:

- log derivatives: per-row summands m_i / (indeterminate - compressed_i)
  are computed with one batched elementwise inversion (scan-free
  Fermat), masked, and prefix-summed;
- running evaluations: per-row affine maps acc -> a_i*acc + b_i are
  composed with the associative rule
  (a2,b2)o(a1,b1) = (a1*a2, b2 + a2*b1); resets and holds are just
  (0, c) and (1, 0) elements.

This module covers the tables whose updates depend only on row-local
masks (program, cascade, lookup, u32 — 7 of the 49 aux columns); the
processor/op-stack/ram/jump-stack/hash extensions (instruction-dependent
factors) remain host-side in tables/master.py for now. Bit-identity with
the host path is tested in tests/test_extend_device.py.
"""

from __future__ import annotations

import functools

import numpy as np

from ..air import columns
from ..crypto import tip5
from ..fields.bfe import P
from ..ops import gf, gfx

M = columns.main_index
A = columns.aux_index


@functools.lru_cache(maxsize=4)
def _scan_fns():
    """Log-depth prefix scans as unrolled Hillis-Steele steps.

    Deliberately NOT lax.associative_scan: its lowering blows up the
    XLA:CPU algebraic simplifier on our u32-limb combiners (see
    memory: same class of pathology as unrolled Fermat chains); the
    manual shift-and-combine ladder is log2(h) small elementwise
    stages that XLA handles fine on every backend."""
    import jax
    import jax.numpy as jnp

    ZERO_FILL = ((0, 0), (0, 0), (0, 0))
    ONE_FILL = ((1, 0), (0, 0), (0, 0))  # XFE one: (1, 0, 0)

    def _shifted(v, d, fills, idx):
        # v[i-d] at position i; positions i < d get the fill value.
        # jnp.roll with a traced shift keeps the whole ladder inside ONE
        # fori_loop body -- unrolled concat/mul ladders send XLA:CPU into
        # pathological compiles even with optimization barriers.
        m = idx >= d
        return tuple(
            (jnp.where(m, jnp.roll(c[0], d), f[0]),
             jnp.where(m, jnp.roll(c[1], d), f[1]))
            for c, f in zip(v, fills))

    def xfe_prefix_sum(v):
        """Inclusive prefix sum of gfx (h,) along axis 0."""
        h = v[0][0].shape[0]
        idx = jnp.arange(h, dtype=jnp.uint32)

        def body(i, v):
            d = jnp.uint32(1) << i
            return gfx.add(v, _shifted(v, d, ZERO_FILL, idx))

        return jax.lax.fori_loop(0, max(h - 1, 1).bit_length(), body, v)

    def affine_scan(a, b):
        """Prefix-compose acc -> a_i*acc + b_i maps (inclusive):
        returns (A, B) with value_i = A_i*acc0 + B_i."""
        h = a[0][0].shape[0]
        idx = jnp.arange(h, dtype=jnp.uint32)

        def body(i, ab):
            a, b = ab
            d = jnp.uint32(1) << i
            pa = _shifted(a, d, ONE_FILL, idx)  # identity map fill
            pb = _shifted(b, d, ZERO_FILL, idx)
            # (a, b) o (pa, pb): x -> a*(pa*x + pb) + b
            return gfx.mul(a, pa), gfx.add(gfx.mul(a, pb), b)

        return jax.lax.fori_loop(0, max(h - 1, 1).bit_length(), body,
                                 (a, b))

    return (jax.jit(xfe_prefix_sum), jax.jit(affine_scan))


def _chx(challenges, name):
    return gfx.full((), tuple(challenges[name]))


def _colv(main, table, name):
    return gf.from_u64(main[:, M(table, name)].astype(np.uint64))


def _lift(v):
    """gf (h,) -> gfx (h,) with zero higher coefficients."""
    z = gf.zeros(gf.shape(v))
    return (v, z, z)


def _wsum(pairs):
    """sum_i weight_i * value_i for (gfx-scalar weight, gf vector) pairs."""
    acc = None
    for w, v in pairs:
        term = gfx.bfe_mul(w, v)
        acc = term if acc is None else gfx.add(acc, term)
    return acc


def _log_derivative(indeterminate, compressed, multiplicity, mask):
    """Masked summands m/(alpha - compressed), prefix-summed."""
    prefix_sum, _ = _scan_fns()
    den = gfx.sub(indeterminate, compressed)
    summand = gfx.bfe_mul(gfx.inv(den), multiplicity)
    zero = gfx.zeros(gf.shape(multiplicity))
    summand = gfx.select(mask, summand, zero)
    return prefix_sum(summand)


def _store(aux, col_index, values):
    """values: gfx (h,) -> aux[:, col, :] (numpy)."""
    aux[:, col_index, :] = np.stack(
        [gf.to_u64(values[c]) for c in range(3)], axis=1)


def extend_program_device(main, aux, challenges, h):
    """table/program.rs:205-264 on device."""
    prefix_sum, affine_scan = _scan_fns()
    addr = _colv(main, "program", "Address")
    instr_u = main[:, M("program", "Instruction")].astype(np.uint64)
    instr = gf.from_u64(instr_u)
    nxt_instr = gf.from_u64(np.roll(instr_u, -1))  # last row: dummy
    mult = _colv(main, "program", "LookupMultiplicity")
    hash_pad = main[:, M("program", "IsHashInputPadding")].astype(np.uint64)
    table_pad = main[:, M("program", "IsTablePadding")].astype(np.uint64)
    idx_in_chunk = main[:, M("program", "IndexInChunk")].astype(np.uint64)

    ch = lambda n: _chx(challenges, n)

    # instruction-lookup log derivative: exclusive prefix (value at row i
    # excludes row i's summand; row h-1 contributes nothing)
    compressed = _wsum([(ch("ProgramAddressWeight"), addr),
                        (ch("ProgramInstructionWeight"), instr),
                        (ch("ProgramNextInstructionWeight"), nxt_instr)])
    active = (hash_pad == 0)
    active[h - 1] = False
    import jax.numpy as jnp
    inclusive = _log_derivative(ch("InstructionLookupIndeterminate"),
                                compressed, mult,
                                jnp.asarray(active))
    exclusive = gfx.tmap(
        lambda x: jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]]),
        inclusive)
    _store(aux, A("program", "InstructionLookupServerLogDerivative"),
           exclusive)

    # prepare-chunk running evaluation with reset at IndexInChunk == 0
    alpha_p = ch("ProgramAttestationPrepareChunkIndeterminate")
    hgfx = lambda s: gfx.tmap(lambda x: jnp.broadcast_to(x, (h,)), s)
    reset = jnp.asarray(idx_in_chunk == 0)
    a = gfx.select(reset, gfx.zeros((h,)), hgfx(alpha_p))
    b_reset = gfx.add(hgfx(alpha_p), _lift(instr))
    b = gfx.select(reset, b_reset, _lift(instr))
    A_pre, B_pre = affine_scan(a, b)
    prep = gfx.add(A_pre, B_pre)  # acc0 = ONE
    _store(aux, A("program", "PrepareChunkRunningEvaluation"), prep)

    # send-chunk running evaluation: update only on chunk-final rows
    alpha_s = ch("ProgramAttestationSendChunkIndeterminate")
    send_mask = jnp.asarray((table_pad == 0)
                            & (idx_in_chunk == tip5.RATE - 1))
    one = gfx.ones((h,))
    a_s = gfx.select(send_mask, hgfx(alpha_s), one)
    b_s = gfx.select(send_mask, prep, gfx.zeros((h,)))
    A_s, B_s = affine_scan(a_s, b_s)
    send = gfx.add(A_s, B_s)  # acc0 = ONE
    _store(aux, A("program", "SendChunkRunningEvaluation"), send)


def extend_cascade_device(main, aux, challenges, h):
    """table/cascade.rs extension on device."""
    import jax.numpy as jnp

    ch = lambda n: _chx(challenges, n)
    is_pad = main[:, M("cascade", "IsPadding")].astype(np.uint64)
    active = jnp.asarray(is_pad != 1)
    lo_in = main[:, M("cascade", "LookInLo")].astype(np.uint64)
    hi_in = main[:, M("cascade", "LookInHi")].astype(np.uint64)
    lo_out = main[:, M("cascade", "LookOutLo")].astype(np.uint64)
    hi_out = main[:, M("cascade", "LookOutHi")].astype(np.uint64)
    mult = _colv(main, "cascade", "LookupMultiplicity")

    look_in = gf.from_u64((hi_in << np.uint64(8)) + lo_in)
    look_out = gf.from_u64((hi_out << np.uint64(8)) + lo_out)
    compressed_hash = _wsum([(ch("HashCascadeLookInWeight"), look_in),
                             (ch("HashCascadeLookOutWeight"), look_out)])
    hash_ld = _log_derivative(ch("HashCascadeLookupIndeterminate"),
                              compressed_hash, mult, active)
    _store(aux, A("cascade", "HashTableServerLogDerivative"), hash_ld)

    # two lookup summands per row (lo and hi limbs)
    ones = gf.ones((h,))
    lo = _wsum([(ch("LookupTableInputWeight"), gf.from_u64(lo_in)),
                (ch("LookupTableOutputWeight"), gf.from_u64(lo_out))])
    hi = _wsum([(ch("LookupTableInputWeight"), gf.from_u64(hi_in)),
                (ch("LookupTableOutputWeight"), gf.from_u64(hi_out))])
    ld_lo = _log_derivative(ch("CascadeLookupIndeterminate"), lo, ones,
                            active)
    ld_hi = _log_derivative(ch("CascadeLookupIndeterminate"), hi, ones,
                            active)
    _store(aux, A("cascade", "LookupTableClientLogDerivative"),
           gfx.add(ld_lo, ld_hi))


def extend_lookup_device(main, aux, challenges, h):
    """table/lookup.rs:27-82 on device."""
    import jax.numpy as jnp

    ch = lambda n: _chx(challenges, n)
    is_pad = main[:, M("lookup", "IsPadding")].astype(np.uint64)
    active = jnp.asarray(is_pad != 1)
    look_in = _colv(main, "lookup", "LookIn")
    look_out = _colv(main, "lookup", "LookOut")
    mult = _colv(main, "lookup", "LookupMultiplicity")

    compressed = _wsum([(ch("LookupTableInputWeight"), look_in),
                        (ch("LookupTableOutputWeight"), look_out)])
    cascade_ld = _log_derivative(ch("CascadeLookupIndeterminate"),
                                 compressed, mult, active)
    _store(aux, A("lookup", "CascadeTableServerLogDerivative"), cascade_ld)

    _, affine_scan = _scan_fns()
    one = gfx.ones((h,))
    alpha = _chx(challenges, "LookupTablePublicIndeterminate")
    hgfx = lambda s: gfx.tmap(lambda x: jnp.broadcast_to(x, (h,)), s)
    a = gfx.select(active, hgfx(alpha), one)
    b = gfx.select(active, _lift(look_out), gfx.zeros((h,)))
    A_e, B_e = affine_scan(a, b)
    _store(aux, A("lookup", "PublicEvaluationArgument"),
           gfx.add(A_e, B_e))  # acc0 = ONE


def extend_u32_device(main, aux, challenges, h):
    """table/u32.rs extension on device."""
    import jax.numpy as jnp

    ch = lambda n: _chx(challenges, n)
    copy = main[:, M("u32", "CopyFlag")].astype(np.uint64)
    active = jnp.asarray(copy == 1)
    compressed = _wsum([
        (ch("U32CiWeight"), _colv(main, "u32", "CI")),
        (ch("U32LhsWeight"), _colv(main, "u32", "LHS")),
        (ch("U32RhsWeight"), _colv(main, "u32", "RHS")),
        (ch("U32ResultWeight"), _colv(main, "u32", "Result"))])
    acc = _log_derivative(ch("U32Indeterminate"), compressed,
                          _colv(main, "u32", "LookupMultiplicity"), active)
    _store(aux, A("u32", "LookupServerLogDerivative"), acc)
