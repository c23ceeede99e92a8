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

- running products: same affine composition with b = 0.

All 49 aux columns of all 9 tables are covered (P10 complete): the
instruction-dependent per-row factors of the processor/op-stack/ram/
jump-stack/hash extensions are computed vectorized from the main columns
(numpy gathers + device field ops; reference semantics at
table/processor.rs:139-263, table/op_stack.rs, table/ram.rs:212-255,
table/jump_stack.rs, table/hash.rs). Bit-identity with the host path is
tested in tests/test_extend_device.py.
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


# ===================================================== shared helpers


def _hgfx(scalar_gfx, h):
    import jax.numpy as jnp
    return gfx.tmap(lambda x: jnp.broadcast_to(x, (h,)), scalar_gfx)


def _prefix_product(a):
    """Inclusive prefix product of gfx (h,) via the affine scan (b=0)."""
    _, affine_scan = _scan_fns()
    A, _ = affine_scan(a, gfx.zeros(gf.shape(a[0])))
    return A


def _prev_col(arr):
    """arr shifted down one row; row 0 becomes 0 (callers mask row 0)."""
    out = np.roll(arr, 1)
    out[0] = 0
    return out


def _xfe_scalar(x):
    return gfx.full((), tuple(x))


# ------------------------------------------------- instruction metadata

@functools.lru_cache(maxsize=1)
def _opcode_tables():
    """numpy lookup tables indexed by opcode (0..255):
    valid, arg_kind (0=none/bfe/call, 1=num_words, 2=stack_elem),
    op-stack influence kind (0 fixed, 1 +arg, 2 -arg), fixed influence."""
    from ..isa.instruction import _SPEC

    valid = np.zeros(256, bool)
    arg_kind = np.zeros(256, np.int8)
    infl_kind = np.zeros(256, np.int8)
    infl_fixed = np.zeros(256, np.int8)
    for name, (op, kind, infl, _is_u32) in _SPEC.items():
        valid[op] = True
        arg_kind[op] = {None: 0, "bfe": 0, "call": 0,
                        "num_words": 1, "stack_elem": 2}[kind]
        if infl is None:
            infl_kind[op] = 2 if name in ("pop", "write_mem", "write_io") \
                else 1
        else:
            infl_kind[op] = 0
            infl_fixed[op] = infl
    return valid, arg_kind, infl_kind, infl_fixed


def _decode_instruction_rows(ci, nia):
    """Vectorized _instruction_from_processor_row: returns (valid, arg)
    where arg is the NIA value clamped into u8 for table lookups."""
    valid_t, arg_kind_t, _, _ = _opcode_tables()
    op = np.where(ci < 256, ci, 0).astype(np.int64)
    valid = valid_t[op] & (ci < 256)
    kind = arg_kind_t[op]
    arg = nia
    valid &= ~((kind == 1) & ((arg < 1) | (arg > 5)))
    valid &= ~((kind == 2) & (arg > 15))
    return valid, arg


def _op(name):
    from ..isa.instruction import _SPEC
    return _SPEC[name][0]


# ===================================================== processor table


def extend_processor_device(main, aux, challenges, h):
    """table/processor.rs:107-263 on device: all 11 processor aux columns
    as log-depth scans with vectorized per-row factors."""
    import jax.numpy as jnp

    prefix_sum, affine_scan = _scan_fns()
    ch = lambda n: _chx(challenges, n)

    def pcol(name):
        return main[:, M("processor", name)].astype(np.uint64)

    ci = pcol("CI")
    nia = pcol("NIA")
    clk = pcol("CLK")
    is_padding = pcol("IsPadding") == 1
    st = [pcol(f"ST{k}") for k in range(16)]
    hv = [pcol(f"HV{k}") for k in range(6)]

    prev_ci = _prev_col(ci)
    prev_nia = _prev_col(nia)
    row_valid, row_arg = _decode_instruction_rows(ci, nia)
    prev_valid = np.concatenate([[False], row_valid[:-1]])
    prev_arg = _prev_col(row_arg)

    one = gfx.ones((h,))
    zero = gfx.zeros((h,))

    # --- input / output eval args (dest-indexed; prev instr read/write_io)
    read_io_op, write_io_op = _op("read_io"), _op("write_io")
    beta_in = challenges["StandardInputIndeterminate"]
    beta_out = challenges["StandardOutputIndeterminate"]
    for which, opcode, beta in (("in", read_io_op, beta_in),
                                ("out", write_io_op, beta_out)):
        from ..fields import xfe as _xfe
        powers = [_xfe.mod_pow(tuple(beta), k) for k in range(6)]
        a = one
        b = zero
        st_rows = st if which == "in" else [_prev_col(s) for s in st]
        for n in range(1, 6):
            mask = jnp.asarray((prev_ci == opcode) & prev_valid
                               & (prev_arg == n))
            mask = mask.at[0].set(False)
            if which == "in":
                b_n = _wsum([(_xfe_scalar(powers[k]), gf.from_u64(st_rows[k]))
                             for k in range(n)])
            else:
                b_n = _wsum([(_xfe_scalar(powers[n - 1 - k]),
                              gf.from_u64(st_rows[k])) for k in range(n)])
            a = gfx.select(mask, _hgfx(_xfe_scalar(powers[n]), h), a)
            b = gfx.select(mask, b_n, b)
        A_, B_ = affine_scan(a, b)
        colname = ("InputTableEvalArg" if which == "in"
                   else "OutputTableEvalArg")
        _store(aux, A("processor", colname), gfx.add(A_, B_))

    # --- instruction lookup client log derivative (inclusive)
    compressed = _wsum([
        (ch("ProgramAddressWeight"), gf.from_u64(pcol("IP"))),
        (ch("ProgramInstructionWeight"), gf.from_u64(ci)),
        (ch("ProgramNextInstructionWeight"), gf.from_u64(nia))])
    active = jnp.asarray(~is_padding)
    ld = _log_derivative(ch("InstructionLookupIndeterminate"), compressed,
                         gf.ones((h,)), active)
    _store(aux, A("processor", "InstructionLookupClientLogDerivative"), ld)

    # --- op stack table perm arg (dest-indexed running product)
    _, _, infl_kind_t, infl_fixed_t = _opcode_tables()
    opi = np.where(prev_ci < 256, prev_ci, 0).astype(np.int64)
    kind = infl_kind_t[opi]
    influence = np.where(
        kind == 0, infl_fixed_t[opi].astype(np.int64),
        np.where(kind == 1, prev_arg.astype(np.int64),
                 -prev_arg.astype(np.int64)))
    influence = np.where(prev_valid, influence, 0)
    factor_active = ~is_padding & prev_valid
    factor_active[0] = False
    delta = np.abs(influence)
    use_prev = influence > 0

    prev_clk = _prev_col(clk)
    prev_ib1 = _prev_col(pcol("IB1"))
    osp = pcol("OpStackPointer")
    prev_osp = _prev_col(osp)
    prev_st = [_prev_col(s) for s in st]

    factor = one
    for off in range(10):  # |influence| is at most 10 (sponge_{absorb,squeeze})
        slot_active = factor_active & (off < delta)
        underflow = np.where(use_prev, prev_st[15 - off], st[15 - off])
        pointer_base = np.where(use_prev, prev_osp, osp)
        pointer = (pointer_base.astype(object) + off) % P
        term = gfx.sub(
            _hgfx(ch("OpStackIndeterminate"), h),
            _wsum([(ch("OpStackClkWeight"), gf.from_u64(prev_clk)),
                   (ch("OpStackIb1Weight"), gf.from_u64(prev_ib1)),
                   (ch("OpStackPointerWeight"),
                    gf.from_u64(pointer.astype(np.uint64))),
                   (ch("OpStackFirstUnderflowElementWeight"),
                    gf.from_u64(underflow))]))
        factor = gfx.select(jnp.asarray(slot_active),
                            gfx.mul(factor, term), factor)
    _store(aux, A("processor", "OpStackTablePermArg"),
           _prefix_product(factor))

    # --- ram table perm arg (dest-indexed running product, <= 10 slots)
    ram_factor = _ram_factors_device(
        main, challenges, h, prev_ci, prev_arg, prev_valid, is_padding,
        prev_clk, st, prev_st, hv)
    _store(aux, A("processor", "RamTablePermArg"),
           _prefix_product(ram_factor))

    # --- jump stack perm arg (inclusive running product)
    compressed = _wsum([
        (ch("JumpStackClkWeight"), gf.from_u64(clk)),
        (ch("JumpStackCiWeight"), gf.from_u64(ci)),
        (ch("JumpStackJspWeight"), gf.from_u64(pcol("JSP"))),
        (ch("JumpStackJsoWeight"), gf.from_u64(pcol("JSO"))),
        (ch("JumpStackJsdWeight"), gf.from_u64(pcol("JSD")))])
    term = gfx.sub(_hgfx(ch("JumpStackIndeterminate"), h), compressed)
    _store(aux, A("processor", "JumpStackTablePermArg"),
           _prefix_product(term))

    # --- hash input eval arg (row-indexed affine scan)
    HASH_OP, MS_OP, MSM_OP = _op("hash"), _op("merkle_step"), \
        _op("merkle_step_mem")
    is_hash = ci == HASH_OP
    is_merkle = (ci == MS_OP) | (ci == MSM_OP)
    left = st[5] % 2 == 0
    sw = [ch(f"StackWeight{k}") for k in range(16)]
    hash_comp = _wsum([(sw[k], gf.from_u64(st[k])) for k in range(10)])
    merkle_l = _wsum([(sw[k], gf.from_u64(st[k])) for k in range(5)]
                     + [(sw[5 + k], gf.from_u64(hv[k])) for k in range(5)])
    merkle_r = _wsum([(sw[k], gf.from_u64(hv[k])) for k in range(5)]
                     + [(sw[5 + k], gf.from_u64(st[k])) for k in range(5)])
    comp = gfx.select(jnp.asarray(is_hash), hash_comp,
                      gfx.select(jnp.asarray(left), merkle_l, merkle_r))
    mask = jnp.asarray(is_hash | is_merkle)
    a = gfx.select(mask, _hgfx(ch("HashInputIndeterminate"), h), one)
    b = gfx.select(mask, comp, zero)
    A_, B_ = affine_scan(a, b)
    _store(aux, A("processor", "HashInputEvalArg"), gfx.add(A_, B_))

    # --- hash digest eval arg (dest-indexed affine scan)
    prev_hashy = np.concatenate([[False], (is_hash | is_merkle)[:-1]])
    digest_comp = _wsum([(sw[k], gf.from_u64(st[k])) for k in range(5)])
    mask = jnp.asarray(prev_hashy)
    a = gfx.select(mask, _hgfx(ch("HashDigestIndeterminate"), h), one)
    b = gfx.select(mask, digest_comp, zero)
    A_, B_ = affine_scan(a, b)
    _store(aux, A("processor", "HashDigestEvalArg"), gfx.add(A_, B_))

    # --- sponge eval arg (dest-indexed affine scan, 4 instruction cases)
    SI, SA, SAM, SS = (_op("sponge_init"), _op("sponge_absorb"),
                       _op("sponge_absorb_mem"), _op("sponge_squeeze"))
    ci_w = ch("HashCIWeight")
    sponge_ind = ch("SpongeIndeterminate")

    def const_term(val):
        return gfx.bfe_mul(ci_w, gf.full((h,), val))

    absorb_comp = gfx.add(const_term(SA), _wsum(
        [(sw[k], gf.from_u64(prev_st[k])) for k in range(10)]))
    sam_elements = ([st[k] for k in (1, 2, 3, 4)]
                    + [_prev_col(h_) for h_ in hv])
    sam_comp = gfx.add(const_term(SA), _wsum(
        [(sw[k], gf.from_u64(e)) for k, e in enumerate(sam_elements)]))
    squeeze_comp = gfx.add(const_term(SS), _wsum(
        [(sw[k], gf.from_u64(st[k])) for k in range(10)]))
    init_comp = const_term(SI)

    b = zero
    for opcode, comp in ((SI, init_comp), (SA, absorb_comp),
                         (SAM, sam_comp), (SS, squeeze_comp)):
        m = jnp.asarray(np.concatenate([[False], (ci == opcode)[:-1]]))
        b = gfx.select(m, comp, b)
    mask_any = np.concatenate(
        [[False], np.isin(ci, [SI, SA, SAM, SS])[:-1]])
    a = gfx.select(jnp.asarray(mask_any), _hgfx(sponge_ind, h), one)
    A_, B_ = affine_scan(a, b)
    _store(aux, A("processor", "SpongeEvalArg"), gfx.add(A_, B_))

    # --- u32 lookup client log derivative (dest-indexed, <= 2 summands)
    u32_ld = _u32_summands_device(
        challenges, h, ci, st, prev_ci, prev_st)
    _store(aux, A("processor", "U32LookupClientLogDerivative"), u32_ld)

    # --- clock jump difference lookup server log derivative (inclusive)
    mult = pcol("ClockJumpDifferenceLookupMultiplicity")
    ld = _log_derivative(ch("ClockJumpDifferenceLookupIndeterminate"),
                         gfx.lift(gf.from_u64(clk)), gf.from_u64(mult),
                         jnp.asarray(mult != 0))
    _store(aux, A("processor",
                  "ClockJumpDifferenceLookupServerLogDerivative"), ld)


def _ram_factors_device(main, challenges, h, prev_ci, prev_arg, prev_valid,
                        is_padding, prev_clk, st, prev_st, hv):
    """Vectorized factor_for_ram_table_running_product
    (processor.rs:646-741): up to 10 (pointer, value) accesses per row."""
    import jax.numpy as jnp

    ch = lambda n: _chx(challenges, n)
    prev_hv = [_prev_col(h_) for h_ in hv]

    READ, WRITE = _op("read_mem"), _op("write_mem")
    SAM, MSM = _op("sponge_absorb_mem"), _op("merkle_step_mem")
    BH, XH = _op("b_horner_step"), _op("x_horner_step")

    is_read = (prev_ci == READ) & prev_valid
    is_write = (prev_ci == WRITE) & prev_valid
    is_sam = prev_ci == SAM
    is_msm = prev_ci == MSM
    is_bh = prev_ci == BH
    is_xh = prev_ci == XH
    base_active = ~is_padding
    base_active[0] = False

    itype = np.where(is_write, 0, 1).astype(np.uint64)

    def modp(arr_obj):
        return (arr_obj % P).astype(np.uint64)

    # per-slot (active, pointer, value), slots 0..9
    n_acc = np.zeros(h, np.int64)
    n_acc = np.where(is_read | is_write, prev_arg.astype(np.int64), n_acc)
    n_acc = np.where(is_sam, 10, n_acc)
    n_acc = np.where(is_msm, 5, n_acc)
    n_acc = np.where(is_bh, 1, n_acc)
    n_acc = np.where(is_xh, 3, n_acc)

    sam_vals = [st[1], st[2], st[3], st[4]] + prev_hv[:6]
    one = gfx.ones((h,))
    factor = one
    for s in range(10):
        active = base_active & (s < n_acc)
        if not active.any():
            continue
        # pointers
        ptr = np.zeros(h, object)
        val = np.zeros(h, np.uint64)
        ptr = np.where(is_read, (st[0].astype(object) + s + 1),
                       ptr)
        val = np.where(is_read & (s < 5),
                       st[min(s + 1, 15)], val)
        ptr = np.where(is_write, (prev_st[0].astype(object) + s), ptr)
        val = np.where(is_write & (s < 5), prev_st[min(s + 1, 15)], val)
        ptr = np.where(is_sam, (prev_st[0].astype(object) + s), ptr)
        val = np.where(is_sam, sam_vals[s], val)
        if s < 5:
            ptr = np.where(is_msm, (prev_st[7].astype(object) + s), ptr)
            val = np.where(is_msm, prev_hv[s], val)
        if s < 1:
            ptr = np.where(is_bh, prev_st[5].astype(object), ptr)
            val = np.where(is_bh, prev_hv[0], val)
        if s < 3:
            ptr = np.where(is_xh,
                           (prev_st[5].astype(object) + (P - 2 + s)), ptr)
            val = np.where(is_xh, prev_hv[s], val)
        ptr = modp(ptr)

        term = gfx.sub(
            _hgfx(ch("RamIndeterminate"), h),
            _wsum([(ch("RamClkWeight"), gf.from_u64(prev_clk)),
                   (ch("RamInstructionTypeWeight"), gf.from_u64(itype)),
                   (ch("RamPointerWeight"), gf.from_u64(ptr)),
                   (ch("RamValueWeight"), gf.from_u64(val))]))
        factor = gfx.select(jnp.asarray(active), gfx.mul(factor, term),
                            factor)
    return factor


def _u32_summands_device(challenges, h, ci, st, prev_ci, prev_st):
    """Vectorized u32-coprocessor log-derivative summands
    (processor.rs u32 section); returns the inclusive prefix sum."""
    import jax.numpy as jnp

    prefix_sum, _ = _scan_fns()
    ch = lambda n: _chx(challenges, n)
    SPLIT, LT, AND, XOR = _op("split"), _op("lt"), _op("and"), _op("xor")
    LOG2, POW, DIVMOD, POPCNT = (_op("log_2_floor"), _op("pow"),
                                 _op("div_mod"), _op("pop_count"))
    MS, MSM = _op("merkle_step"), _op("merkle_step_mem")

    w_lhs, w_rhs = ch("U32LhsWeight"), ch("U32RhsWeight")
    w_ci, w_res = ch("U32CiWeight"), ch("U32ResultWeight")
    alpha = ch("U32Indeterminate")

    inv2 = pow(2, P - 2, P)
    and_result = gf.mul_const(
        gf.sub(gf.add(gf.from_u64(prev_st[0]), gf.from_u64(prev_st[1])),
               gf.from_u64(st[0])), inv2)

    is_split = prev_ci == SPLIT
    is_ltandpow = np.isin(prev_ci, [LT, AND, POW])
    is_xor = prev_ci == XOR
    is_log2pop = np.isin(prev_ci, [LOG2, POPCNT])
    is_divmod = prev_ci == DIVMOD
    is_merkle = np.isin(prev_ci, [MS, MSM])
    not_first = np.arange(h) > 0

    def comp(lhs=None, rhs=None, ci_val=None, res=None):
        parts = []
        if lhs is not None:
            parts.append(gfx.bfe_mul(w_lhs, lhs))
        if rhs is not None:
            parts.append(gfx.bfe_mul(w_rhs, rhs))
        if ci_val is not None:
            parts.append(gfx.bfe_mul(w_ci, ci_val))
        if res is not None:
            parts.append(gfx.bfe_mul(w_res, res))
        acc = parts[0]
        for p in parts[1:]:
            acc = gfx.add(acc, p)
        return acc

    g = gf.from_u64
    const = lambda v: gf.full((h,), v)

    # slot 1: every u32-ish instruction contributes one summand
    comp1 = gfx.zeros((h,))
    cases = [
        (is_split, comp(lhs=g(st[0]), rhs=g(st[1]), ci_val=const(SPLIT))),
        (is_ltandpow, comp(lhs=g(prev_st[0]), rhs=g(prev_st[1]),
                           ci_val=g(prev_ci), res=g(st[0]))),
        (is_xor, comp(lhs=g(prev_st[0]), rhs=g(prev_st[1]),
                      ci_val=const(AND), res=and_result)),
        (is_log2pop, comp(lhs=g(prev_st[0]), ci_val=g(prev_ci),
                          res=g(st[0]))),
        (is_divmod, comp(lhs=g(st[0]), rhs=g(prev_st[1]),
                         ci_val=const(LT), res=gf.ones((h,)))),
        (is_merkle, comp(lhs=g(prev_st[5]), rhs=g(st[5]),
                         ci_val=const(SPLIT))),
    ]
    active1 = np.zeros(h, bool)
    for m, c in cases:
        mm = m & not_first
        comp1 = gfx.select(jnp.asarray(mm), c, comp1)
        active1 |= mm

    den1 = gfx.sub(_hgfx(alpha, h), comp1)
    summand1 = gfx.inv(den1)
    summand1 = gfx.select(jnp.asarray(active1), summand1, gfx.zeros((h,)))

    # slot 2: div_mod's second (range-check) summand
    active2 = is_divmod & not_first
    comp2 = comp(lhs=g(prev_st[0]), rhs=g(st[1]), ci_val=const(SPLIT))
    summand2 = gfx.inv(gfx.sub(_hgfx(alpha, h), comp2))
    summand2 = gfx.select(jnp.asarray(active2), summand2, gfx.zeros((h,)))

    return prefix_sum(gfx.add(summand1, summand2))


# ===================================================== op-stack table


def extend_op_stack_device(main, aux, challenges, h):
    """table/op_stack.rs extension on device."""
    import jax.numpy as jnp

    ch = lambda n: _chx(challenges, n)
    col = lambda n: main[:, M("op_stack", n)].astype(np.uint64)
    clk, ib1 = col("CLK"), col("IB1ShrinkStack")
    ptr, under = col("StackPointer"), col("FirstUnderflowElement")
    not_padding = ib1 != 2

    compressed = _wsum([
        (ch("OpStackClkWeight"), gf.from_u64(clk)),
        (ch("OpStackIb1Weight"), gf.from_u64(ib1)),
        (ch("OpStackPointerWeight"), gf.from_u64(ptr)),
        (ch("OpStackFirstUnderflowElementWeight"), gf.from_u64(under))])
    term = gfx.sub(_hgfx(ch("OpStackIndeterminate"), h), compressed)
    factor = gfx.select(jnp.asarray(not_padding), term, gfx.ones((h,)))
    _store(aux, A("op_stack", "RunningProductPermArg"),
           _prefix_product(factor))

    same_ptr = np.concatenate([[False], ptr[1:] == ptr[:-1]])
    active = not_padding & same_ptr
    active[0] = False
    diff = (clk.astype(object) - _prev_col(clk).astype(object)) % P
    ld = _log_derivative(
        ch("ClockJumpDifferenceLookupIndeterminate"),
        gfx.lift(gf.from_u64(diff.astype(np.uint64))),
        gf.ones((h,)), jnp.asarray(active))
    _store(aux, A("op_stack",
                  "ClockJumpDifferenceLookupClientLogDerivative"), ld)


# ========================================================= ram table


def extend_ram_device(main, aux, challenges, h):
    """table/ram.rs extension on device (incl. the Bézout running
    columns, ram.rs:212-255)."""
    import jax.numpy as jnp

    _, affine_scan = _scan_fns()
    ch = lambda n: _chx(challenges, n)
    col = lambda n: main[:, M("ram", n)].astype(np.uint64)
    clk, itype = col("CLK"), col("InstructionType")
    ptr, val = col("RamPointer"), col("RamValue")
    bez = ch("RamTableBezoutRelationIndeterminate")
    not_padding = itype != 2
    prev_ptr = _prev_col(ptr)
    ptr_changed = ptr != prev_ptr
    ptr_changed[0] = False
    change = not_padding & ptr_changed
    change[0] = False

    one = gfx.ones((h,))
    zero = gfx.zeros((h,))
    beta_minus_ptr = gfx.sub(_hgfx(bez, h), gfx.lift(gf.from_u64(ptr)))

    # running product of (beta - ptr): row 0 always contributes
    factor = gfx.select(jnp.asarray(change), beta_minus_ptr, one)
    first = np.zeros(h, bool)
    first[0] = True
    factor = gfx.select(jnp.asarray(first), beta_minus_ptr, factor)
    rp = _prefix_product(factor)
    _store(aux, A("ram", "RunningProductOfRAMP"), rp)

    # formal derivative: fd_i = a_i fd_{i-1} + [change] rp_{i-1}
    rp_prev = gfx.tmap(
        lambda x: jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]]), rp)
    # row 0: fd = 1 (identity map on acc0 = 1)
    a = gfx.select(jnp.asarray(change), beta_minus_ptr, one)
    b = gfx.select(jnp.asarray(change), rp_prev, zero)
    A_, B_ = affine_scan(a, b)
    _store(aux, A("ram", "FormalDerivative"), gfx.add(A_, B_))

    # Bézout coefficient running evaluations
    for colname, main_col in (
            ("BezoutCoefficient0", "BezoutCoefficientPolynomialCoefficient0"),
            ("BezoutCoefficient1", "BezoutCoefficientPolynomialCoefficient1")):
        coeff = gf.from_u64(col(main_col))
        a = gfx.select(jnp.asarray(change), _hgfx(bez, h), one)
        a = gfx.select(jnp.asarray(first), zero, a)  # kill acc0 influence
        b = gfx.select(jnp.asarray(change | first), gfx.lift(coeff), zero)
        A_, B_ = affine_scan(a, b)
        _store(aux, A("ram", colname), gfx.add(A_, B_))

    # running product perm arg
    compressed = _wsum([
        (ch("RamClkWeight"), gf.from_u64(clk)),
        (ch("RamInstructionTypeWeight"), gf.from_u64(itype)),
        (ch("RamPointerWeight"), gf.from_u64(ptr)),
        (ch("RamValueWeight"), gf.from_u64(val))])
    term = gfx.sub(_hgfx(ch("RamIndeterminate"), h), compressed)
    factor = gfx.select(jnp.asarray(not_padding), term, one)
    _store(aux, A("ram", "RunningProductPermArg"), _prefix_product(factor))

    # clock jump difference log derivative
    same = not_padding & ~ptr_changed
    same[0] = False
    diff = (clk.astype(object) - _prev_col(clk).astype(object)) % P
    ld = _log_derivative(
        ch("ClockJumpDifferenceLookupIndeterminate"),
        gfx.lift(gf.from_u64(diff.astype(np.uint64))),
        gf.ones((h,)), jnp.asarray(same))
    _store(aux, A("ram", "ClockJumpDifferenceLookupClientLogDerivative"),
           ld)


# ==================================================== jump-stack table


def extend_jump_stack_device(main, aux, challenges, h):
    """table/jump_stack.rs extension on device."""
    import jax.numpy as jnp

    ch = lambda n: _chx(challenges, n)
    col = lambda n: main[:, M("jump_stack", n)].astype(np.uint64)
    clk = col("CLK")
    compressed = _wsum([
        (ch("JumpStackClkWeight"), gf.from_u64(clk)),
        (ch("JumpStackCiWeight"), gf.from_u64(col("CI"))),
        (ch("JumpStackJspWeight"), gf.from_u64(col("JSP"))),
        (ch("JumpStackJsoWeight"), gf.from_u64(col("JSO"))),
        (ch("JumpStackJsdWeight"), gf.from_u64(col("JSD")))])
    term = gfx.sub(_hgfx(ch("JumpStackIndeterminate"), h), compressed)
    _store(aux, A("jump_stack", "RunningProductPermArg"),
           _prefix_product(term))

    jsp = col("JSP")
    same = np.concatenate([[False], jsp[1:] == jsp[:-1]])
    diff = (clk.astype(object) - _prev_col(clk).astype(object)) % P
    ld = _log_derivative(
        ch("ClockJumpDifferenceLookupIndeterminate"),
        gfx.lift(gf.from_u64(diff.astype(np.uint64))),
        gf.ones((h,)), jnp.asarray(same))
    _store(aux, A("jump_stack",
                  "ClockJumpDifferenceLookupClientLogDerivative"), ld)


# ========================================================= hash table


def extend_hash_device(main, aux, challenges, h):
    """table/hash.rs extension on device: 4 running evaluations + 16
    cascade log derivatives."""
    import jax.numpy as jnp

    from ..fields import xfe as _xfe
    from ..fields.bfe import R_INV

    _, affine_scan = _scan_fns()
    ch = lambda n: _chx(challenges, n)
    col = lambda n: main[:, M("hash", n)].astype(np.uint64)
    mode, rn, ci = col("Mode"), col("RoundNumber"), col("CI")
    SI = _op("sponge_init")
    is_si = ci == SI

    # rate registers: first 4 states recombined from 16-bit limbs
    # (x Montgomery R^-1), states 4..9 direct
    limb_consts = [R_INV, (1 << 16) * R_INV % P, (1 << 32) * R_INV % P,
                   (1 << 48) * R_INV % P]
    parts = ("Lowest", "MidLow", "MidHigh", "Highest")
    rate = []
    for k in range(4):
        acc = None
        for c, part in zip(limb_consts, parts):
            term = gf.mul_const(
                gf.from_u64(col(f"State{k}{part}LkIn")), c)
            acc = term if acc is None else gf.add(acc, term)
        rate.append(acc)
    for k in range(4, 10):
        rate.append(gf.from_u64(col(f"State{k}")))

    sw = [ch(f"StackWeight{k}") for k in range(16)]
    compressed_row = _wsum([(sw[k], rate[k]) for k in range(10)])

    one = gfx.ones((h,))
    zero = gfx.zeros((h,))

    # receive-chunk running evaluation (mode 1, round 0)
    alpha_prep = challenges["ProgramAttestationPrepareChunkIndeterminate"]
    prep_pows = [_xfe.mod_pow(tuple(alpha_prep), j) for j in range(11)]
    chunk = _hgfx(_xfe_scalar(prep_pows[10]), h)
    chunk = gfx.add(chunk, _wsum(
        [(_xfe_scalar(prep_pows[9 - k]), rate[k]) for k in range(10)]))
    m_recv = jnp.asarray((mode == 1) & (rn == 0))
    a = gfx.select(
        m_recv, _hgfx(ch("ProgramAttestationSendChunkIndeterminate"), h),
        one)
    b = gfx.select(m_recv, chunk, zero)
    A_, B_ = affine_scan(a, b)
    _store(aux, A("hash", "ReceiveChunkRunningEvaluation"), gfx.add(A_, B_))

    # sponge running evaluation (mode 2, round 0)
    ci_term = gfx.bfe_mul(ch("HashCIWeight"), gf.from_u64(ci))
    m_si = jnp.asarray((mode == 2) & (rn == 0) & is_si)
    m_sponge = jnp.asarray((mode == 2) & (rn == 0) & ~is_si)
    b = gfx.select(m_si, ci_term, zero)
    b = gfx.select(m_sponge, gfx.add(ci_term, compressed_row), b)
    m_any = jnp.asarray((mode == 2) & (rn == 0))
    a = gfx.select(m_any, _hgfx(ch("SpongeIndeterminate"), h), one)
    A_, B_ = affine_scan(a, b)
    _store(aux, A("hash", "SpongeRunningEvaluation"), gfx.add(A_, B_))

    # hash-input running evaluation (mode 3, round 0)
    m_hin = jnp.asarray((mode == 3) & (rn == 0))
    a = gfx.select(m_hin, _hgfx(ch("HashInputIndeterminate"), h), one)
    b = gfx.select(m_hin, compressed_row, zero)
    A_, B_ = affine_scan(a, b)
    _store(aux, A("hash", "HashInputRunningEvaluation"), gfx.add(A_, B_))

    # hash-digest running evaluation (mode 3, last round)
    digest_comp = _wsum([(sw[k], rate[k]) for k in range(5)])
    m_dig = jnp.asarray((mode == 3) & (rn == tip5.NUM_ROUNDS))
    a = gfx.select(m_dig, _hgfx(ch("HashDigestIndeterminate"), h), one)
    b = gfx.select(m_dig, digest_comp, zero)
    A_, B_ = affine_scan(a, b)
    _store(aux, A("hash", "HashDigestRunningEvaluation"), gfx.add(A_, B_))

    # 16 cascade log derivatives
    active = jnp.asarray((mode != 0) & (rn != tip5.NUM_ROUNDS) & ~is_si)
    ones = gf.ones((h,))
    for k in range(4):
        for part in parts:
            lk_in = gf.from_u64(col(f"State{k}{part}LkIn"))
            lk_out = gf.from_u64(col(f"State{k}{part}LkOut"))
            comp = _wsum([(ch("HashCascadeLookInWeight"), lk_in),
                          (ch("HashCascadeLookOutWeight"), lk_out)])
            ld = _log_derivative(ch("HashCascadeLookupIndeterminate"),
                                 comp, ones, active)
            _store(aux, A("hash",
                          f"CascadeState{k}{part}ClientLogDerivative"), ld)


# ================================================= full device extend


def extend_all_device(main, challenges):
    """Device counterpart of tables/master.py::extend covering all 9
    tables / 49 aux columns."""
    h = main.shape[0]
    aux = np.zeros((h, 91, 3), np.uint64)  # master aux table width
    extend_program_device(main, aux, challenges, h)
    extend_processor_device(main, aux, challenges, h)
    extend_op_stack_device(main, aux, challenges, h)
    extend_ram_device(main, aux, challenges, h)
    extend_jump_stack_device(main, aux, challenges, h)
    extend_hash_device(main, aux, challenges, h)
    extend_cascade_device(main, aux, challenges, h)
    extend_lookup_device(main, aux, challenges, h)
    extend_u32_device(main, aux, challenges, h)
    return aux


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
