"""Device aux-table extension (SURVEY.md §2.5 P10) as a 3-phase pipeline.

The reference computes every aux column as a sequential prefix scan over
rows (running evaluations, running products, log-derivative sums — e.g.
table/program.rs:205-264, table/lookup.rs:27-82). All of these updates
are associative, so on TPU they become log-depth scans:

- log derivatives: per-row summands m_i / (indeterminate - compressed_i)
  with one batched elementwise inversion (scan-free Fermat), masked,
  prefix-summed;
- running evaluations: per-row affine maps acc -> a_i*acc + b_i composed
  with (a2,b2)o(a1,b1) = (a1*a2, b2 + a2*b1); resets and holds are just
  (0, c) and (1, 0) elements;
- running products: same affine composition with b = 0.

All 49 aux columns of all 9 tables are covered (P10 complete), in three
phases of compiled XLA programs with materialized boundaries:

  A. per-table FACTOR programs (9): purely elementwise — per-row
     log-derivative denominators/numerators/masks and affine (a, b)
     pairs from the packed main table + challenges;
  B1. one SCAN program: a single batched Fermat inversion over every
     log-derivative denominator in the protocol ((~25, h) at once), one
     batched prefix-sum, and one batched affine scan over all
     independent running evaluations/products;
  B2. one ASSEMBLY program: second-round scans whose factors consume
     first-round outputs (Program.SendChunk consumes PrepareChunk,
     Ram.FormalDerivative consumes RunningProductOfRAMP), summand sums,
     exclusive shifts, and the final (49, 3, 2, h) packing.

Phase boundaries force materialization: XLA:CPU's fusion emitter
re-computes multi-use producers per use, which goes exponential when two
deep field-arithmetic chains merge into the init of a while loop
(measured: a single `prefix_sum(s1 + s2)` over the u32 summand chains
never terminates at h=16; `optimization_barrier` does not stop the
merge). Materialized buffers between programs are a hard stop. The
batched inversion/scans are also simply better TPU programs: one 63-step
square-and-multiply loop over a (25, h) block instead of 25 loops.

Host <-> device traffic per extension: 4 uploads (main-table limb
planes, challenge limb planes) + 1 download (packed aux columns); all
intermediate arrays stay on device. Instruction-dependent per-row
factors follow reference semantics at table/processor.rs:139-263,
table/op_stack.rs, table/ram.rs:212-255, table/jump_stack.rs,
table/hash.rs. Bit-identity with the host path is tested in
tests/test_extend_device.py.
"""

from __future__ import annotations

import functools

import numpy as np

from ..air import columns
from ..air.challenges import CHALLENGE_NAMES, ID as CH_ID
from ..crypto import tip5
from ..fields.bfe import P, R_INV
from ..ops import gf, gfx

M = columns.main_index
A = columns.aux_index

MASK32 = np.uint64(0xFFFFFFFF)


# ------------------------------------------------------------- host packing


def _pack_u64(arr):
    """numpy u64 (...,) -> (lo, hi) u32 numpy pair."""
    a = np.asarray(arr, np.uint64)
    return ((a & MASK32).astype(np.uint32),
            (a >> np.uint64(32)).astype(np.uint32))


def _pack_main(main):
    """(h, 379) u64 main table -> column-major (379, h) u32 limb pair."""
    return _pack_u64(np.ascontiguousarray(main.T))


def _pack_challenges(challenges):
    """Challenges -> (63, 3) u32 limb pair."""
    arr = np.zeros((len(CHALLENGE_NAMES), 3), np.uint64)
    for i, name in enumerate(CHALLENGE_NAMES):
        arr[i] = challenges[name]
    return _pack_u64(arr)


# ------------------------------------------------------------- traced scans


@functools.lru_cache(maxsize=4)
def _scan_fns():
    """Log-depth prefix scans along the LAST axis, as Hillis-Steele
    ladders inside a fori_loop.

    Deliberately NOT lax.associative_scan: its lowering blows up the
    XLA:CPU algebraic simplifier on our u32-limb combiners; the manual
    shift-and-combine ladder is log2(h) small elementwise stages that
    XLA handles fine on every backend."""
    import jax
    import jax.numpy as jnp

    ZERO_FILL = ((0, 0), (0, 0), (0, 0))
    ONE_FILL = ((1, 0), (0, 0), (0, 0))  # XFE one: (1, 0, 0)

    def _shifted(v, d, fills, idx):
        # v[..., i-d] at position i; positions i < d get the fill value.
        # jnp.roll with a traced shift keeps the whole ladder inside ONE
        # fori_loop body -- unrolled concat/mul ladders send XLA:CPU
        # into pathological compiles even with optimization barriers.
        m = idx >= d
        return tuple(
            (jnp.where(m, jnp.roll(c[0], d, axis=-1), f[0]),
             jnp.where(m, jnp.roll(c[1], d, axis=-1), f[1]))
            for c, f in zip(v, fills))

    def xfe_prefix_sum(v):
        """Inclusive prefix sum of gfx (..., h) along the last axis."""
        h = v[0][0].shape[-1]
        idx = jnp.arange(h, dtype=jnp.uint32)

        def body(i, v):
            d = jnp.uint32(1) << i
            return gfx.add(v, _shifted(v, d, ZERO_FILL, idx))

        return jax.lax.fori_loop(0, max(h - 1, 1).bit_length(), body, v)

    def affine_scan(a, b):
        """Prefix-compose acc -> a_i*acc + b_i maps (inclusive, along
        the last axis): returns (A, B) with value_i = A_i*acc0 + B_i."""
        h = a[0][0].shape[-1]
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

    return (xfe_prefix_sum, affine_scan)


# -------------------------------------------------------- traced utilities


class _Ctx:
    """Traced accessors over the packed main table and challenges."""

    def __init__(self, mlo, mhi, clo, chi):
        self.mlo, self.mhi = mlo, mhi
        self.clo, self.chi = clo, chi
        self.h = mlo.shape[1]

    def col(self, table, name):
        """Main column as gf (h,)."""
        i = M(table, name)
        return (self.mlo[i], self.mhi[i])

    def ch(self, name):
        """Challenge as gfx scalar."""
        i = CH_ID[name]
        return tuple((self.clo[i, c], self.chi[i, c]) for c in range(3))


def _prev_gf(v):
    """gf (h,) shifted down one row; row 0 becomes 0."""
    import jax.numpy as jnp
    return tuple(jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])
                 for x in v)


def _prev_gfx(v):
    return tuple(_prev_gf(c) for c in v)


def _prev_mask(m):
    import jax.numpy as jnp
    return jnp.concatenate([jnp.zeros((1,), bool), m[:-1]])


def _next_gf(v):
    """gf (h,) shifted up one row; last row becomes 0."""
    import jax.numpy as jnp
    return tuple(jnp.concatenate([x[1:], jnp.zeros((1,), x.dtype)])
                 for x in v)


def _eqc(v, c: int):
    """gf (h,) == Python constant c (full 64-bit compare)."""
    return (v[0] == np.uint32(c & 0xFFFFFFFF)) & \
        (v[1] == np.uint32(c >> 32))


def _lift(v):
    """gf -> gfx with zero higher coefficients."""
    z = gf.zeros(gf.shape(v))
    return (v, z, z)


def _bc(scalar_gfx, h):
    """Broadcast a gfx scalar to (h,)."""
    import jax.numpy as jnp
    return gfx.tmap(lambda x: jnp.broadcast_to(x, (h,)), scalar_gfx)


def _wsum(pairs):
    """sum_i weight_i * value_i for (gfx-scalar weight, gf vector) pairs."""
    acc = None
    for w, v in pairs:
        term = gfx.bfe_mul(w, v)
        acc = term if acc is None else gfx.add(acc, term)
    return acc


def _gfx_stack(vs, axis=0):
    """Stack a list of gfx trees along a new axis."""
    import jax.numpy as jnp
    return gfx.tmap(lambda *ls: jnp.stack(ls, axis=axis), *vs)


def _gfx_row(v, i):
    return gfx.tmap(lambda x: x[i], v)


def _gf_stack(vs, axis=0):
    import jax.numpy as jnp
    return tuple(jnp.stack([v[i] for v in vs], axis=axis)
                 for i in range(2))


def _masked_product(terms, actives):
    """prod_s select(active_s, term_s, 1), as a sequential fold.

    Deliberately NOT a stacked log-depth tree: slicing through stacked
    arrays re-triggers XLA:CPU's exponential fusion-through-concatenate
    compiles. Ten sequential gfx.muls trace fast and fuse fine."""
    ones = gfx.ones(gf.shape(terms[0][0]))
    factor = None
    for t, m in zip(terms, actives):
        ft = gfx.select(m, t, ones)
        factor = ft if factor is None else gfx.mul(factor, ft)
    return factor


def _ch_pows(scalar, n):
    """[scalar^0 .. scalar^n] as traced gfx scalars."""
    pows = [gfx.ones(())]
    for _ in range(n):
        pows.append(gfx.mul(pows[-1], scalar))
    return pows


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


def _op(name):
    from ..isa.instruction import _SPEC
    return _SPEC[name][0]


def _decode_rows(ci, nia):
    """Traced _instruction_from_processor_row: (valid, arg_i32) where
    arg is clamped to i32 for influence math (only used under `valid`)."""
    import jax.numpy as jnp

    valid_t, arg_kind_t, _, _ = _opcode_tables()
    in_range = _eqc_lt256(ci)
    op = jnp.where(in_range, ci[0], 0).astype(jnp.int32)
    valid = jnp.asarray(valid_t)[op] & in_range
    kind = jnp.asarray(arg_kind_t)[op]
    arg_nonzero = (nia[0] | nia[1]) != 0
    arg_gt5 = (nia[1] > 0) | (nia[0] > 5)
    arg_gt15 = (nia[1] > 0) | (nia[0] > 15)
    valid &= ~((kind == 1) & (~arg_nonzero | arg_gt5))
    valid &= ~((kind == 2) & arg_gt15)
    arg_i32 = nia[0].astype(jnp.int32)
    return valid, arg_i32, op


def _eqc_lt256(v):
    return (v[1] == 0) & (v[0] < 256)


# ==================================================== factor collector


class _Collector:
    """Gathers every scan's per-row inputs during a factor trace.

    ld rows: value_i = sum_{j<=i} [mask_j] num_j / den_j, later summed
    per column (a column may own several rows). aff rows: inclusive
    affine composition with acc0 = ONE; column value = A + B."""

    def __init__(self, h):
        self.h = h
        self.ld_ids = []    # col ids, one per ld row
        self.ld_dens = []
        self.ld_nums = []
        self.ld_masks = []
        self.aff_ids = []   # col ids, one per affine row
        self.aff_a = []
        self.aff_b = []

    def ld(self, col_id, indeterminate, compressed, mult, mask):
        import jax.numpy as jnp
        self.ld_ids.append(col_id)
        self.ld_dens.append(gfx.sub(_bc(indeterminate, self.h),
                                    compressed))
        self.ld_nums.append(mult)
        self.ld_masks.append(jnp.broadcast_to(mask, (self.h,)))

    def aff(self, col_id, a, b):
        self.aff_ids.append(col_id)
        self.aff_a.append(a)
        self.aff_b.append(b)

    def prod(self, col_id, factor):
        self.aff(col_id, factor, gfx.zeros((self.h,)))

    def stacked(self):
        out = {}
        if self.ld_ids:
            out["ld_den"] = _gfx_stack(self.ld_dens)
            out["ld_num"] = _gf_stack(self.ld_nums)
            import jax.numpy as jnp
            out["ld_mask"] = jnp.stack(self.ld_masks)
        if self.aff_ids:
            out["aff_a"] = _gfx_stack(self.aff_a)
            out["aff_b"] = _gfx_stack(self.aff_b)
        return out


# ===================================================== per-table factors


def _fac_program(ctx, C):
    """table/program.rs:205-264."""
    import jax.numpy as jnp

    h, ch = ctx.h, ctx.ch
    addr = ctx.col("program", "Address")
    instr = ctx.col("program", "Instruction")
    nxt_instr = _next_gf(instr)  # last row masked out below
    mult = ctx.col("program", "LookupMultiplicity")
    hash_pad = ctx.col("program", "IsHashInputPadding")
    table_pad = ctx.col("program", "IsTablePadding")
    idx_in_chunk = ctx.col("program", "IndexInChunk")

    # instruction-lookup log derivative; the served value at row i
    # excludes row i's own summand -> exclusive shift in phase B2
    compressed = _wsum([(ch("ProgramAddressWeight"), addr),
                        (ch("ProgramInstructionWeight"), instr),
                        (ch("ProgramNextInstructionWeight"), nxt_instr)])
    active = _eqc(hash_pad, 0) & (jnp.arange(h) != h - 1)
    C.ld(A("program", "InstructionLookupServerLogDerivative"),
         ch("InstructionLookupIndeterminate"), compressed, mult, active)

    # prepare-chunk running evaluation with reset at IndexInChunk == 0
    alpha_p = ch("ProgramAttestationPrepareChunkIndeterminate")
    reset = _eqc(idx_in_chunk, 0)
    a = gfx.select(reset, gfx.zeros((h,)), _bc(alpha_p, h))
    b_reset = gfx.add(_bc(alpha_p, h), _lift(instr))
    b = gfx.select(reset, b_reset, _lift(instr))
    C.aff(A("program", "PrepareChunkRunningEvaluation"), a, b)
    # send-chunk consumes the prepare-chunk scan -> phase B2


def _fac_cascade(ctx, C):
    """table/cascade.rs extension."""
    h, ch = ctx.h, ctx.ch
    active = ~_eqc(ctx.col("cascade", "IsPadding"), 1)
    lo_in = ctx.col("cascade", "LookInLo")
    hi_in = ctx.col("cascade", "LookInHi")
    lo_out = ctx.col("cascade", "LookOutLo")
    hi_out = ctx.col("cascade", "LookOutHi")
    mult = ctx.col("cascade", "LookupMultiplicity")

    look_in = gf.add(gf.mul_const(hi_in, 1 << 8), lo_in)
    look_out = gf.add(gf.mul_const(hi_out, 1 << 8), lo_out)
    compressed_hash = _wsum([(ch("HashCascadeLookInWeight"), look_in),
                             (ch("HashCascadeLookOutWeight"), look_out)])
    C.ld(A("cascade", "HashTableServerLogDerivative"),
         ch("HashCascadeLookupIndeterminate"), compressed_hash, mult,
         active)

    # two lookup summands per row (lo and hi limbs) -> same column
    ones = gf.ones((h,))
    lo = _wsum([(ch("LookupTableInputWeight"), lo_in),
                (ch("LookupTableOutputWeight"), lo_out)])
    hi = _wsum([(ch("LookupTableInputWeight"), hi_in),
                (ch("LookupTableOutputWeight"), hi_out)])
    cid = A("cascade", "LookupTableClientLogDerivative")
    C.ld(cid, ch("CascadeLookupIndeterminate"), lo, ones, active)
    C.ld(cid, ch("CascadeLookupIndeterminate"), hi, ones, active)


def _fac_lookup(ctx, C):
    """table/lookup.rs:27-82."""
    h, ch = ctx.h, ctx.ch
    active = ~_eqc(ctx.col("lookup", "IsPadding"), 1)
    look_in = ctx.col("lookup", "LookIn")
    look_out = ctx.col("lookup", "LookOut")
    mult = ctx.col("lookup", "LookupMultiplicity")

    compressed = _wsum([(ch("LookupTableInputWeight"), look_in),
                        (ch("LookupTableOutputWeight"), look_out)])
    C.ld(A("lookup", "CascadeTableServerLogDerivative"),
         ch("CascadeLookupIndeterminate"), compressed, mult, active)

    one = gfx.ones((h,))
    alpha = ch("LookupTablePublicIndeterminate")
    a = gfx.select(active, _bc(alpha, h), one)
    b = gfx.select(active, _lift(look_out), gfx.zeros((h,)))
    C.aff(A("lookup", "PublicEvaluationArgument"), a, b)


class _ProcPrelude:
    """Shared decoded quantities for the processor factor sub-programs.

    The processor table's factor graph is too large for one XLA:CPU
    compile (the fusion passes go superlinear); it is split into four
    programs, each recomputing this cheap elementwise prelude."""

    def __init__(self, ctx):
        import jax.numpy as jnp

        pcol = lambda n: ctx.col("processor", n)
        self.pcol = pcol
        self.ci = pcol("CI")
        self.nia = pcol("NIA")
        self.clk = pcol("CLK")
        self.is_padding = _eqc(pcol("IsPadding"), 1)
        self.st = [pcol(f"ST{k}") for k in range(16)]
        self.hv = [pcol(f"HV{k}") for k in range(6)]
        self.prev_st = [_prev_gf(s) for s in self.st]
        self.prev_hv = [_prev_gf(v) for v in self.hv]
        self.prev_clk = _prev_gf(self.clk)
        row_valid, row_arg, _ = _decode_rows(self.ci, self.nia)
        self.prev_valid = _prev_mask(row_valid)
        self.prev_arg = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), row_arg[:-1]])
        self.prev_ci_is = \
            lambda opcode: _prev_mask(_eqc(self.ci, opcode))


def _fac_processor_io(ctx, C):
    """processor.rs: io eval args + instruction lookup + jump stack."""
    h, ch = ctx.h, ctx.ch
    p = _ProcPrelude(ctx)
    ci, nia, clk = p.ci, p.nia, p.clk
    st, prev_st = p.st, p.prev_st
    prev_valid, prev_arg, prev_ci_is = \
        p.prev_valid, p.prev_arg, p.prev_ci_is
    is_padding = p.is_padding
    pcol = p.pcol

    one = gfx.ones((h,))
    zero = gfx.zeros((h,))

    # --- input / output eval args (dest-indexed; prev instr read/write_io)
    for which, opcode, beta_name in (
            ("in", _op("read_io"), "StandardInputIndeterminate"),
            ("out", _op("write_io"), "StandardOutputIndeterminate")):
        pows = _ch_pows(ch(beta_name), 5)
        a = one
        b = zero
        st_rows = st if which == "in" else prev_st
        op_mask = prev_ci_is(opcode) & prev_valid
        for n in range(1, 6):
            mask = op_mask & (prev_arg == n)
            if which == "in":
                b_n = _wsum([(pows[k], st_rows[k]) for k in range(n)])
            else:
                b_n = _wsum([(pows[n - 1 - k], st_rows[k])
                             for k in range(n)])
            a = gfx.select(mask, _bc(pows[n], h), a)
            b = gfx.select(mask, b_n, b)
        colname = ("InputTableEvalArg" if which == "in"
                   else "OutputTableEvalArg")
        C.aff(A("processor", colname), a, b)

    # --- instruction lookup client log derivative (inclusive)
    compressed = _wsum([
        (ch("ProgramAddressWeight"), pcol("IP")),
        (ch("ProgramInstructionWeight"), ci),
        (ch("ProgramNextInstructionWeight"), nia)])
    C.ld(A("processor", "InstructionLookupClientLogDerivative"),
         ch("InstructionLookupIndeterminate"), compressed,
         gf.ones((h,)), ~is_padding)

    # --- jump stack perm arg (inclusive running product)
    compressed = _wsum([
        (ch("JumpStackClkWeight"), clk),
        (ch("JumpStackCiWeight"), ci),
        (ch("JumpStackJspWeight"), pcol("JSP")),
        (ch("JumpStackJsoWeight"), pcol("JSO")),
        (ch("JumpStackJsdWeight"), pcol("JSD"))])
    C.prod(A("processor", "JumpStackTablePermArg"),
           gfx.sub(_bc(ch("JumpStackIndeterminate"), h), compressed))

    # --- clock jump difference lookup server log derivative (inclusive)
    mult = pcol("ClockJumpDifferenceLookupMultiplicity")
    C.ld(A("processor", "ClockJumpDifferenceLookupServerLogDerivative"),
         ch("ClockJumpDifferenceLookupIndeterminate"), _lift(clk), mult,
         ~gf.is_zero(mult))


def _fac_processor_stack(ctx, C):
    """processor.rs: op-stack + RAM running-product factors."""
    import jax.numpy as jnp

    h, ch = ctx.h, ctx.ch
    p = _ProcPrelude(ctx)
    ci, clk = p.ci, p.clk
    st, prev_st, prev_hv = p.st, p.prev_st, p.prev_hv
    prev_clk = p.prev_clk
    prev_valid, prev_arg, prev_ci_is = \
        p.prev_valid, p.prev_arg, p.prev_ci_is
    is_padding = p.is_padding
    pcol = p.pcol

    # --- op stack table perm arg (dest-indexed running product)
    _, _, infl_kind_t, infl_fixed_t = _opcode_tables()
    opi = jnp.where(_eqc_lt256(ci), ci[0], 0).astype(jnp.int32)
    prev_opi = jnp.concatenate([jnp.zeros((1,), jnp.int32), opi[:-1]])
    kind = jnp.asarray(infl_kind_t)[prev_opi]
    influence = jnp.where(
        kind == 0, jnp.asarray(infl_fixed_t)[prev_opi].astype(jnp.int32),
        jnp.where(kind == 1, prev_arg, -prev_arg))
    influence = jnp.where(prev_valid, influence, 0)
    factor_active = ~is_padding & prev_valid
    delta = jnp.abs(influence)
    use_prev = influence > 0

    prev_ib1 = _prev_gf(pcol("IB1"))
    osp = pcol("OpStackPointer")
    prev_osp = _prev_gf(osp)

    # slot-invariant part of every term, hoisted out of the slot loop
    os_base = gfx.sub(
        _bc(ch("OpStackIndeterminate"), h),
        _wsum([(ch("OpStackClkWeight"), prev_clk),
               (ch("OpStackIb1Weight"), prev_ib1)]))
    pointer0 = gf.select(use_prev, prev_osp, osp)
    terms, actives = [], []
    for off in range(10):  # |influence| <= 10 (sponge_{absorb,squeeze})
        underflow = gf.select(use_prev, prev_st[15 - off], st[15 - off])
        pointer = gf.add(pointer0, gf.full((), off))
        terms.append(gfx.sub(os_base, _wsum([
            (ch("OpStackPointerWeight"), pointer),
            (ch("OpStackFirstUnderflowElementWeight"), underflow)])))
        actives.append(factor_active & (off < delta))
    C.prod(A("processor", "OpStackTablePermArg"),
           _masked_product(terms, actives))

    # --- ram table perm arg (dest-indexed running product, <= 10 slots)
    C.prod(A("processor", "RamTablePermArg"), _ram_factors(
        ctx, prev_ci_is, prev_arg, prev_valid, is_padding,
        prev_clk, st, prev_st, prev_hv))


def _fac_processor_hash(ctx, C):
    """processor.rs: hash-input/digest/sponge eval-arg factors."""
    h, ch = ctx.h, ctx.ch
    p = _ProcPrelude(ctx)
    ci = p.ci
    st, hv, prev_st, prev_hv = p.st, p.hv, p.prev_st, p.prev_hv
    prev_ci_is = p.prev_ci_is

    one = gfx.ones((h,))
    zero = gfx.zeros((h,))

    # --- hash input eval arg (row-indexed affine scan)
    is_hash = _eqc(ci, _op("hash"))
    is_merkle = _eqc(ci, _op("merkle_step")) | \
        _eqc(ci, _op("merkle_step_mem"))
    left = (st[5][0] & 1) == 0
    sw = [ch(f"StackWeight{k}") for k in range(16)]
    hash_comp = _wsum([(sw[k], st[k]) for k in range(10)])
    merkle_l = _wsum([(sw[k], st[k]) for k in range(5)]
                     + [(sw[5 + k], hv[k]) for k in range(5)])
    merkle_r = _wsum([(sw[k], hv[k]) for k in range(5)]
                     + [(sw[5 + k], st[k]) for k in range(5)])
    comp = gfx.select(is_hash, hash_comp,
                      gfx.select(left, merkle_l, merkle_r))
    mask = is_hash | is_merkle
    a = gfx.select(mask, _bc(ch("HashInputIndeterminate"), h), one)
    b = gfx.select(mask, comp, zero)
    C.aff(A("processor", "HashInputEvalArg"), a, b)

    # --- hash digest eval arg (dest-indexed affine scan)
    prev_hashy = _prev_mask(mask)
    digest_comp = _wsum([(sw[k], st[k]) for k in range(5)])
    a = gfx.select(prev_hashy, _bc(ch("HashDigestIndeterminate"), h), one)
    b = gfx.select(prev_hashy, digest_comp, zero)
    C.aff(A("processor", "HashDigestEvalArg"), a, b)

    # --- sponge eval arg (dest-indexed affine scan, 4 instruction cases)
    SI, SA, SAM, SS = (_op("sponge_init"), _op("sponge_absorb"),
                       _op("sponge_absorb_mem"), _op("sponge_squeeze"))
    ci_w = ch("HashCIWeight")

    def const_term(val):
        return gfx.bfe_mul(ci_w, gf.full((h,), val))

    absorb_comp = gfx.add(const_term(SA), _wsum(
        [(sw[k], prev_st[k]) for k in range(10)]))
    sam_elements = [st[k] for k in (1, 2, 3, 4)] + prev_hv
    sam_comp = gfx.add(const_term(SA), _wsum(
        [(sw[k], e) for k, e in enumerate(sam_elements)]))
    squeeze_comp = gfx.add(const_term(SS), _wsum(
        [(sw[k], st[k]) for k in range(10)]))
    init_comp = const_term(SI)

    b = zero
    mask_any = None
    for opcode, comp in ((SI, init_comp), (SA, absorb_comp),
                         (SAM, sam_comp), (SS, squeeze_comp)):
        m = prev_ci_is(opcode)
        b = gfx.select(m, comp, b)
        mask_any = m if mask_any is None else (mask_any | m)
    a = gfx.select(mask_any, _bc(ch("SpongeIndeterminate"), h), one)
    C.aff(A("processor", "SpongeEvalArg"), a, b)


def _fac_processor_u32(ctx, C):
    """processor.rs: u32 lookup client factors (<= 2 summands/row)."""
    p = _ProcPrelude(ctx)
    _u32_summands(ctx, C, p.ci, p.st, p.prev_ci_is, p.prev_st)


def _ram_factors(ctx, prev_ci_is, prev_arg, prev_valid, is_padding,
                 prev_clk, st, prev_st, prev_hv):
    """Traced factor_for_ram_table_running_product
    (processor.rs:646-741): up to 10 (pointer, value) accesses per row."""
    import jax.numpy as jnp

    h, ch = ctx.h, ctx.ch

    is_read = prev_ci_is(_op("read_mem")) & prev_valid
    is_write = prev_ci_is(_op("write_mem")) & prev_valid
    is_sam = prev_ci_is(_op("sponge_absorb_mem"))
    is_msm = prev_ci_is(_op("merkle_step_mem"))
    is_bh = prev_ci_is(_op("b_horner_step"))
    is_xh = prev_ci_is(_op("x_horner_step"))
    base_active = ~is_padding & (jnp.arange(h) > 0)

    itype = gf.select(is_write, gf.zeros((h,)), gf.ones((h,)))

    # per-slot access count
    n_acc = jnp.zeros(h, jnp.int32)
    n_acc = jnp.where(is_read | is_write, prev_arg, n_acc)
    n_acc = jnp.where(is_sam, 10, n_acc)
    n_acc = jnp.where(is_msm, 5, n_acc)
    n_acc = jnp.where(is_bh, 1, n_acc)
    n_acc = jnp.where(is_xh, 3, n_acc)

    sam_vals = [st[1], st[2], st[3], st[4]] + prev_hv[:6]
    zero = gf.zeros((h,))
    # slot-invariant part of every term, hoisted out of the slot loop
    base = gfx.sub(
        _bc(ch("RamIndeterminate"), h),
        _wsum([(ch("RamClkWeight"), prev_clk),
               (ch("RamInstructionTypeWeight"), itype)]))
    terms, actives = [], []
    for s in range(10):
        ptr = zero
        val = zero
        ptr = gf.select(is_read, gf.add(st[0], gf.full((), s + 1)), ptr)
        if s < 5:
            val = gf.select(is_read, st[s + 1], val)
        ptr = gf.select(is_write, gf.add(prev_st[0], gf.full((), s)), ptr)
        if s < 5:
            val = gf.select(is_write, prev_st[s + 1], val)
        ptr = gf.select(is_sam, gf.add(prev_st[0], gf.full((), s)), ptr)
        val = gf.select(is_sam, sam_vals[s], val)
        if s < 5:
            ptr = gf.select(is_msm, gf.add(prev_st[7], gf.full((), s)),
                            ptr)
            val = gf.select(is_msm, prev_hv[s], val)
        if s < 1:
            ptr = gf.select(is_bh, prev_st[5], ptr)
            val = gf.select(is_bh, prev_hv[0], val)
        if s < 3:
            ptr = gf.select(is_xh,
                            gf.add(prev_st[5], gf.full((), (P - 2 + s) % P)),
                            ptr)
            val = gf.select(is_xh, prev_hv[s], val)

        terms.append(gfx.sub(base, _wsum([
            (ch("RamPointerWeight"), ptr),
            (ch("RamValueWeight"), val)])))
        actives.append(base_active & (s < n_acc))
    return _masked_product(terms, actives)


def _u32_summands(ctx, C, ci, st, prev_ci_is, prev_st):
    """Traced u32-coprocessor log-derivative summands
    (processor.rs u32 section): two rows into one column."""
    import jax.numpy as jnp

    h, ch = ctx.h, ctx.ch
    SPLIT, LT, AND, XOR = _op("split"), _op("lt"), _op("and"), _op("xor")
    LOG2, POW, DIVMOD, POPCNT = (_op("log_2_floor"), _op("pow"),
                                 _op("div_mod"), _op("pop_count"))
    MS, MSM = _op("merkle_step"), _op("merkle_step_mem")

    w_lhs, w_rhs = ch("U32LhsWeight"), ch("U32RhsWeight")
    w_ci, w_res = ch("U32CiWeight"), ch("U32ResultWeight")
    alpha = ch("U32Indeterminate")

    inv2 = pow(2, P - 2, P)
    and_result = gf.mul_const(
        gf.sub(gf.add(prev_st[0], prev_st[1]), st[0]), inv2)

    prev_ci = _prev_gf(ci)

    is_split = prev_ci_is(SPLIT)
    is_ltandpow = prev_ci_is(LT) | prev_ci_is(AND) | prev_ci_is(POW)
    is_xor = prev_ci_is(XOR)
    is_log2pop = prev_ci_is(LOG2) | prev_ci_is(POPCNT)
    is_divmod = prev_ci_is(DIVMOD)
    is_merkle = prev_ci_is(MS) | prev_ci_is(MSM)
    not_first = jnp.arange(h) > 0

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

    const = lambda v: gf.full((h,), v)

    # row 1: every u32-ish instruction contributes one summand
    comp1 = gfx.zeros((h,))
    cases = [
        (is_split, comp(lhs=st[0], rhs=st[1], ci_val=const(SPLIT))),
        (is_ltandpow, comp(lhs=prev_st[0], rhs=prev_st[1],
                           ci_val=prev_ci, res=st[0])),
        (is_xor, comp(lhs=prev_st[0], rhs=prev_st[1],
                      ci_val=const(AND), res=and_result)),
        (is_log2pop, comp(lhs=prev_st[0], ci_val=prev_ci, res=st[0])),
        (is_divmod, comp(lhs=st[0], rhs=prev_st[1],
                         ci_val=const(LT), res=gf.ones((h,)))),
        (is_merkle, comp(lhs=prev_st[5], rhs=st[5], ci_val=const(SPLIT))),
    ]
    active1 = None
    for m, c in cases:
        mm = m & not_first
        comp1 = gfx.select(mm, c, comp1)
        active1 = mm if active1 is None else (active1 | mm)
    cid = A("processor", "U32LookupClientLogDerivative")
    ones = gf.ones((h,))
    C.ld(cid, alpha, comp1, ones, active1)

    # row 2: div_mod's second (range-check) summand
    active2 = is_divmod & not_first
    comp2 = comp(lhs=prev_st[0], rhs=st[1], ci_val=const(SPLIT))
    C.ld(cid, alpha, comp2, ones, active2)


def _fac_op_stack(ctx, C):
    """table/op_stack.rs extension."""
    import jax.numpy as jnp

    h, ch = ctx.h, ctx.ch
    col = lambda n: ctx.col("op_stack", n)
    clk, ib1 = col("CLK"), col("IB1ShrinkStack")
    ptr, under = col("StackPointer"), col("FirstUnderflowElement")
    not_padding = ~_eqc(ib1, 2)

    compressed = _wsum([
        (ch("OpStackClkWeight"), clk),
        (ch("OpStackIb1Weight"), ib1),
        (ch("OpStackPointerWeight"), ptr),
        (ch("OpStackFirstUnderflowElementWeight"), under)])
    term = gfx.sub(_bc(ch("OpStackIndeterminate"), h), compressed)
    C.prod(A("op_stack", "RunningProductPermArg"),
           gfx.select(not_padding, term, gfx.ones((h,))))

    same_ptr = gf.eq(ptr, _prev_gf(ptr)) & (jnp.arange(h) > 0)
    diff = gf.sub(clk, _prev_gf(clk))
    C.ld(A("op_stack", "ClockJumpDifferenceLookupClientLogDerivative"),
         ch("ClockJumpDifferenceLookupIndeterminate"), _lift(diff),
         gf.ones((h,)), not_padding & same_ptr)


def _fac_ram(ctx, C):
    """table/ram.rs extension (incl. the Bézout running columns,
    ram.rs:212-255)."""
    import jax.numpy as jnp

    h, ch = ctx.h, ctx.ch
    col = lambda n: ctx.col("ram", n)
    clk, itype = col("CLK"), col("InstructionType")
    ptr, val = col("RamPointer"), col("RamValue")
    bez = ch("RamTableBezoutRelationIndeterminate")
    not_padding = ~_eqc(itype, 2)
    not_first = jnp.arange(h) > 0
    ptr_changed = ~gf.eq(ptr, _prev_gf(ptr)) & not_first
    change = not_padding & ptr_changed

    one = gfx.ones((h,))
    zero = gfx.zeros((h,))
    beta_minus_ptr = gfx.sub(_bc(bez, h), _lift(ptr))

    # running product of (beta - ptr): row 0 always contributes
    first = ~not_first
    C.prod(A("ram", "RunningProductOfRAMP"),
           gfx.select(change | first, beta_minus_ptr, one))
    # FormalDerivative consumes the RunningProductOfRAMP scan -> B2

    # Bézout coefficient running evaluations
    for colname, main_col in (
            ("BezoutCoefficient0",
             "BezoutCoefficientPolynomialCoefficient0"),
            ("BezoutCoefficient1",
             "BezoutCoefficientPolynomialCoefficient1")):
        coeff = col(main_col)
        a = gfx.select(change, _bc(bez, h), one)
        a = gfx.select(first, zero, a)  # kill acc0 influence
        b = gfx.select(change | first, _lift(coeff), zero)
        C.aff(A("ram", colname), a, b)

    # running product perm arg
    compressed = _wsum([
        (ch("RamClkWeight"), clk),
        (ch("RamInstructionTypeWeight"), itype),
        (ch("RamPointerWeight"), ptr),
        (ch("RamValueWeight"), val)])
    term = gfx.sub(_bc(ch("RamIndeterminate"), h), compressed)
    C.prod(A("ram", "RunningProductPermArg"),
           gfx.select(not_padding, term, one))

    # clock jump difference log derivative
    same = not_padding & ~ptr_changed & not_first
    diff = gf.sub(clk, _prev_gf(clk))
    C.ld(A("ram", "ClockJumpDifferenceLookupClientLogDerivative"),
         ch("ClockJumpDifferenceLookupIndeterminate"), _lift(diff),
         gf.ones((h,)), same)


def _fac_jump_stack(ctx, C):
    """table/jump_stack.rs extension."""
    import jax.numpy as jnp

    h, ch = ctx.h, ctx.ch
    col = lambda n: ctx.col("jump_stack", n)
    clk = col("CLK")
    compressed = _wsum([
        (ch("JumpStackClkWeight"), clk),
        (ch("JumpStackCiWeight"), col("CI")),
        (ch("JumpStackJspWeight"), col("JSP")),
        (ch("JumpStackJsoWeight"), col("JSO")),
        (ch("JumpStackJsdWeight"), col("JSD"))])
    C.prod(A("jump_stack", "RunningProductPermArg"),
           gfx.sub(_bc(ch("JumpStackIndeterminate"), h), compressed))

    jsp = col("JSP")
    same = gf.eq(jsp, _prev_gf(jsp)) & (jnp.arange(h) > 0)
    diff = gf.sub(clk, _prev_gf(clk))
    C.ld(A("jump_stack", "ClockJumpDifferenceLookupClientLogDerivative"),
         ch("ClockJumpDifferenceLookupIndeterminate"), _lift(diff),
         gf.ones((h,)), same)


def _fac_hash(ctx, C):
    """table/hash.rs extension: 4 running evaluations + 16 cascade log
    derivatives."""
    h, ch = ctx.h, ctx.ch
    col = lambda n: ctx.col("hash", n)
    mode, rn, ci = col("Mode"), col("RoundNumber"), col("CI")
    is_si = _eqc(ci, _op("sponge_init"))

    # rate registers: first 4 states recombined from 16-bit limbs
    # (x Montgomery R^-1), states 4..9 direct
    limb_consts = [R_INV, (1 << 16) * R_INV % P, (1 << 32) * R_INV % P,
                   (1 << 48) * R_INV % P]
    parts = ("Lowest", "MidLow", "MidHigh", "Highest")
    rate = []
    for k in range(4):
        acc = None
        for c, part in zip(limb_consts, parts):
            term = gf.mul_const(col(f"State{k}{part}LkIn"), c)
            acc = term if acc is None else gf.add(acc, term)
        rate.append(acc)
    for k in range(4, 10):
        rate.append(col(f"State{k}"))

    sw = [ch(f"StackWeight{k}") for k in range(16)]
    compressed_row = _wsum([(sw[k], rate[k]) for k in range(10)])

    one = gfx.ones((h,))
    zero = gfx.zeros((h,))
    rn0 = _eqc(rn, 0)

    # receive-chunk running evaluation (mode 1, round 0)
    prep_pows = _ch_pows(
        ch("ProgramAttestationPrepareChunkIndeterminate"), 10)
    chunk = _bc(prep_pows[10], h)
    chunk = gfx.add(chunk, _wsum(
        [(prep_pows[9 - k], rate[k]) for k in range(10)]))
    m_recv = _eqc(mode, 1) & rn0
    a = gfx.select(
        m_recv, _bc(ch("ProgramAttestationSendChunkIndeterminate"), h),
        one)
    b = gfx.select(m_recv, chunk, zero)
    C.aff(A("hash", "ReceiveChunkRunningEvaluation"), a, b)

    # sponge running evaluation (mode 2, round 0)
    ci_term = gfx.bfe_mul(ch("HashCIWeight"), ci)
    m_any = _eqc(mode, 2) & rn0
    m_si = m_any & is_si
    m_sponge = m_any & ~is_si
    b = gfx.select(m_si, ci_term, zero)
    b = gfx.select(m_sponge, gfx.add(ci_term, compressed_row), b)
    a = gfx.select(m_any, _bc(ch("SpongeIndeterminate"), h), one)
    C.aff(A("hash", "SpongeRunningEvaluation"), a, b)

    # hash-input running evaluation (mode 3, round 0)
    m_hin = _eqc(mode, 3) & rn0
    a = gfx.select(m_hin, _bc(ch("HashInputIndeterminate"), h), one)
    b = gfx.select(m_hin, compressed_row, zero)
    C.aff(A("hash", "HashInputRunningEvaluation"), a, b)

    # hash-digest running evaluation (mode 3, last round)
    digest_comp = _wsum([(sw[k], rate[k]) for k in range(5)])
    m_dig = _eqc(mode, 3) & _eqc(rn, tip5.NUM_ROUNDS)
    a = gfx.select(m_dig, _bc(ch("HashDigestIndeterminate"), h), one)
    b = gfx.select(m_dig, digest_comp, zero)
    C.aff(A("hash", "HashDigestRunningEvaluation"), a, b)

    # 16 cascade log derivatives
    active = ~_eqc(mode, 0) & ~_eqc(rn, tip5.NUM_ROUNDS) & ~is_si
    ones = gf.ones((h,))
    for k in range(4):
        for part in parts:
            lk_in = col(f"State{k}{part}LkIn")
            lk_out = col(f"State{k}{part}LkOut")
            comp = _wsum([(ch("HashCascadeLookInWeight"), lk_in),
                          (ch("HashCascadeLookOutWeight"), lk_out)])
            C.ld(A("hash", f"CascadeState{k}{part}ClientLogDerivative"),
                 ch("HashCascadeLookupIndeterminate"), comp, ones,
                 active)


def _fac_u32(ctx, C):
    """table/u32.rs extension."""
    ch = ctx.ch
    active = _eqc(ctx.col("u32", "CopyFlag"), 1)
    compressed = _wsum([
        (ch("U32CiWeight"), ctx.col("u32", "CI")),
        (ch("U32LhsWeight"), ctx.col("u32", "LHS")),
        (ch("U32RhsWeight"), ctx.col("u32", "RHS")),
        (ch("U32ResultWeight"), ctx.col("u32", "Result"))])
    C.ld(A("u32", "LookupServerLogDerivative"),
         ch("U32Indeterminate"), compressed,
         ctx.col("u32", "LookupMultiplicity"), active)


# Each table maps to one or more factor sub-programs; the processor
# table is split four ways to keep each XLA:CPU compile tractable.
_TABLE_FAC = {
    "program": [_fac_program],
    "processor": [_fac_processor_io, _fac_processor_stack,
                  _fac_processor_hash, _fac_processor_u32],
    "op_stack": [_fac_op_stack],
    "ram": [_fac_ram],
    "jump_stack": [_fac_jump_stack],
    "hash": [_fac_hash],
    "cascade": [_fac_cascade],
    "lookup": [_fac_lookup],
    "u32": [_fac_u32],
}

# columns whose scans run in phase B2 (consume phase-B1 scan outputs)
_ROUND2_COLS = ("SendChunkRunningEvaluation", "FormalDerivative")


@functools.lru_cache(maxsize=None)
def _phase_a(table, sub):
    """(jitted factor sub-program, ids dict filled at first trace)."""
    import jax

    ids = {}

    def f(mlo, mhi, clo, chi):
        ctx = _Ctx(mlo, mhi, clo, chi)
        C = _Collector(ctx.h)
        _TABLE_FAC[table][sub](ctx, C)
        new = {"ld": tuple(C.ld_ids), "aff": tuple(C.aff_ids)}
        assert ids.get("ld", new["ld"]) == new["ld"]
        ids.update(new)
        return C.stacked()

    return jax.jit(f), ids


def _phase_b1_fn(facs):
    """Batched inversion + batched scans over every table's factors.
    `facs`: list (in TABLE_IDS order) of phase-A output dicts."""
    import jax.numpy as jnp

    prefix_sum, affine_scan = _scan_fns()
    dens = _gfx_cat([f["ld_den"] for f in facs if "ld_den" in f])
    nums = _gf_cat([f["ld_num"] for f in facs if "ld_num" in f])
    masks = jnp.concatenate([f["ld_mask"] for f in facs
                             if "ld_mask" in f])
    summands = gfx.bfe_mul(gfx.inv(dens), nums)
    summands = gfx.select(masks, summands, gfx.zeros(masks.shape))
    ld_sums = prefix_sum(summands)

    aff_a = _gfx_cat([f["aff_a"] for f in facs if "aff_a" in f])
    aff_b = _gfx_cat([f["aff_b"] for f in facs if "aff_b" in f])
    A_, B_ = affine_scan(aff_a, aff_b)
    return {"ld": ld_sums, "aff": gfx.add(A_, B_)}


def _gfx_cat(vs):
    import jax.numpy as jnp
    return gfx.tmap(lambda *ls: jnp.concatenate(ls), *vs)


def _gf_cat(vs):
    import jax.numpy as jnp
    return tuple(jnp.concatenate([v[i] for v in vs]) for i in range(2))


@functools.lru_cache(maxsize=None)
def _phase_b1():
    import jax
    return jax.jit(_phase_b1_fn)


@functools.lru_cache(maxsize=None)
def _phase_b2(ld_ids, aff_ids):
    """Assembly: per-column sums, exclusive shifts, second-round scans,
    final (49, 3, 2, h) packing."""
    import jax
    import jax.numpy as jnp

    def f(mlo, mhi, clo, chi, scans):
        ctx = _Ctx(mlo, mhi, clo, chi)
        h, ch = ctx.h, ctx.ch
        _, affine_scan = _scan_fns()
        vals = {}
        for i, cid in enumerate(ld_ids):
            row = _gfx_row(scans["ld"], i)
            vals[cid] = gfx.add(vals[cid], row) if cid in vals else row
        # the program instruction-lookup server excludes its own row
        excl = A("program", "InstructionLookupServerLogDerivative")
        vals[excl] = _prev_gfx(vals[excl])
        for i, cid in enumerate(aff_ids):
            vals[cid] = _gfx_row(scans["aff"], i)

        one = gfx.ones((h,))
        zero = gfx.zeros((h,))

        # --- round 2a: Program.SendChunk consumes PrepareChunk
        prep = vals[A("program", "PrepareChunkRunningEvaluation")]
        table_pad = ctx.col("program", "IsTablePadding")
        idx_in_chunk = ctx.col("program", "IndexInChunk")
        send_mask = _eqc(table_pad, 0) & _eqc(idx_in_chunk, tip5.RATE - 1)
        a_s = gfx.select(send_mask,
                         _bc(ch("ProgramAttestationSendChunkIndeterminate"),
                             h), one)
        b_s = gfx.select(send_mask, prep, zero)

        # --- round 2b: Ram.FormalDerivative consumes RunningProductOfRAMP
        rp = vals[A("ram", "RunningProductOfRAMP")]
        itype = ctx.col("ram", "InstructionType")
        ptr = ctx.col("ram", "RamPointer")
        bez = ch("RamTableBezoutRelationIndeterminate")
        not_first = jnp.arange(h) > 0
        change = ~_eqc(itype, 2) & ~gf.eq(ptr, _prev_gf(ptr)) & not_first
        beta_minus_ptr = gfx.sub(_bc(bez, h), _lift(ptr))
        rp_prev = _prev_gfx(rp)
        # row 0: fd = 1 (identity map on acc0 = 1)
        a_f = gfx.select(change, beta_minus_ptr, one)
        b_f = gfx.select(change, rp_prev, zero)

        A2, B2 = affine_scan(_gfx_stack([a_s, a_f]),
                             _gfx_stack([b_s, b_f]))
        r2 = gfx.add(A2, B2)
        vals[A("program", "SendChunkRunningEvaluation")] = _gfx_row(r2, 0)
        vals[A("ram", "FormalDerivative")] = _gfx_row(r2, 1)

        assert sorted(vals) == list(range(columns.NUM_AUX_AIR_COLUMNS))
        return jnp.stack([
            jnp.stack([jnp.stack(vals[i][c]) for c in range(3)])
            for i in range(columns.NUM_AUX_AIR_COLUMNS)])

    return jax.jit(f)


def _unpack_cols(packed) -> np.ndarray:
    """(n, 3, 2, h) u32 device array -> (h, n, 3) u64 numpy."""
    a = np.asarray(packed)
    u64 = a[:, :, 0].astype(np.uint64) | \
        (a[:, :, 1].astype(np.uint64) << np.uint64(32))  # (n, 3, h)
    return np.ascontiguousarray(u64.transpose(2, 0, 1))


def _device_inputs(main, challenges):
    import jax
    mlo, mhi = _pack_main(main)
    clo, chi = _pack_challenges(challenges)
    return tuple(jax.device_put(x) for x in (mlo, mhi, clo, chi))


def _run_pipeline_inputs(inputs):
    facs = []
    ld_ids, aff_ids = [], []
    for table in columns.TABLE_IDS:
        for sub in range(len(_TABLE_FAC[table])):
            jit_fn, ids = _phase_a(table, sub)
            facs.append(jit_fn(*inputs))
            ld_ids += list(ids["ld"])
            aff_ids += list(ids["aff"])
    scans = _phase_b1()(facs)
    return _phase_b2(tuple(ld_ids), tuple(aff_ids))(*inputs, scans)


def _run_pipeline(main, challenges):
    """Returns the packed (49, 3, 2, h) device array."""
    return _run_pipeline_inputs(_device_inputs(main, challenges))


def extend_all_device(main, challenges):
    """Device counterpart of tables/master.py::extend covering all 9
    tables / 49 aux columns."""
    from ..tables.master import NUM_AUX

    h = main.shape[0]
    packed = _run_pipeline(main, challenges)
    aux = np.zeros((h, NUM_AUX, 3), np.uint64)
    aux[:, :columns.NUM_AUX_AIR_COLUMNS, :] = _unpack_cols(packed)
    return aux


# ------------------------------------------- per-table host entry points
# (kept for the bit-identity tests; each runs the pipeline and copies
# out only its table's columns)


def _extend_table_into(table, main, aux, challenges):
    full = extend_all_device(main, challenges)
    start = columns.AUX_TABLE_START[table]
    n = len(columns.AUX_COLUMNS[table])
    aux[:, start:start + n, :] = full[:, start:start + n, :]


def extend_program_device(main, aux, challenges, h):
    _extend_table_into("program", main, aux, challenges)


def extend_processor_device(main, aux, challenges, h):
    _extend_table_into("processor", main, aux, challenges)


def extend_op_stack_device(main, aux, challenges, h):
    _extend_table_into("op_stack", main, aux, challenges)


def extend_ram_device(main, aux, challenges, h):
    _extend_table_into("ram", main, aux, challenges)


def extend_jump_stack_device(main, aux, challenges, h):
    _extend_table_into("jump_stack", main, aux, challenges)


def extend_hash_device(main, aux, challenges, h):
    _extend_table_into("hash", main, aux, challenges)


def extend_cascade_device(main, aux, challenges, h):
    _extend_table_into("cascade", main, aux, challenges)


def extend_lookup_device(main, aux, challenges, h):
    _extend_table_into("lookup", main, aux, challenges)


def extend_u32_device(main, aux, challenges, h):
    _extend_table_into("u32", main, aux, challenges)



# ====================================================== derived columns
# Device-tape evaluation of the degree-lowering substitutions: all 230
# main / 41 aux derived columns in one compiled dispatch each, replacing
# the vectorized host object math (master.fill_derived_{main,aux}_columns).
#
# Substitution RHSes may reference earlier derived columns (within a
# phase, and later phases may read earlier phases' columns). Rather than
# sequencing 271 dependent fills, the chains are INLINED: every read of a
# derived column is replaced by that column's (already-rewritten) RHS
# node, producing one row-local DAG whose outputs are all derived
# columns at once. A NEXT-row read of a derived column inlines the RHS
# with its inputs shifted current->next (well-defined because single-row
# phases are row-local and tran-phase variables are never read at NEXT —
# the reference's generated fill would panic otherwise,
# substitutions.rs:266-301). Transition-phase outputs zero their last
# row, exactly like the reference's s![0..num_rows-1] dual-row fill.


@functools.lru_cache(maxsize=None)
def _derived_fill_tape(main_only: bool):
    """(tape, [(kind, col)], [zero_last_row]) for the inlined DAG."""
    import itertools

    from ..air import circuit as C
    from ..air.compile import compile_tape
    from ..air.evaluate import linearize, substitution_pairs
    from ..air.master import master_air

    air = master_air()
    subs_by_phase = air.main_subs if main_only else air.aux_subs
    fresh = itertools.count(1)
    derived: dict[tuple, C.Node] = {}  # (MAIN|AUX, col) -> rewritten RHS
    # Node ids are only unique PER BUILDER and each phase has its own
    # builder (master.py), so the combined DAG must be rebuilt with fresh
    # globally-unique ids. Memo keys use OBJECT identity (hash-consed
    # within a builder), never node.id.
    memo: dict[tuple, C.Node] = {}

    def clone(node, shift):
        key = (id(node), shift)
        if key in memo:
            return memo[key]
        if node.kind == "input":
            ik, col = node.value
            base_ik = {C.NEXT_MAIN: C.MAIN, C.NEXT_AUX: C.AUX}.get(ik, ik)
            if (base_ik, col) in derived:
                want_shift = shift or ik in (C.NEXT_MAIN, C.NEXT_AUX)
                assert not (shift and ik in (C.NEXT_MAIN, C.NEXT_AUX)), \
                    "derived column read two rows ahead"
                res = clone(derived[(base_ik, col)], want_shift)
            else:
                if shift:
                    assert ik in (C.MAIN, C.AUX), \
                        "cannot shift an already-next-row input"
                    ik = C.NEXT_MAIN if ik == C.MAIN else C.NEXT_AUX
                res = C.Node(next(fresh), "input", (ik, col))
        elif node.kind != "binop":
            res = C.Node(next(fresh), node.kind, node.value)
        else:
            l = clone(node.lhs, shift)
            r = clone(node.rhs, shift)
            res = C.Node(next(fresh), "binop", op=node.op, lhs=l, rhs=r)
        memo[key] = res
        return res

    exprs, cols, zero_last = [], [], []
    for phase in ("init", "cons", "tran", "term"):
        for kind, col, rhs in substitution_pairs(subs_by_phase[phase]):
            node = clone(rhs, False)
            derived[(kind, col)] = node
            exprs.append(C.Expr(None, node))
            cols.append((kind, col))
            zero_last.append(phase == "tran")

    steps, out_ids = linearize(exprs)
    return compile_tape(steps, out_ids), tuple(cols), tuple(zero_last)


@functools.lru_cache(maxsize=8)
def _derived_fill_fn(main_only: bool, h: int):
    import jax

    from ..air.compile import run_tape_scan

    tape, cols, zero_last = _derived_fill_tape(main_only)
    zl = np.array(zero_last, bool)

    def fn(main_cols, aux_cols, ch):
        next_main = gf.tmap(lambda a: jnp.roll(a, -1, axis=1), main_cols)
        next_aux = (None if aux_cols is None else
                    gfx.tmap(lambda a: jnp.roll(a, -1, axis=1), aux_cols))
        out = run_tape_scan(tape, main_cols, aux_cols, ch,
                            next_main=next_main, next_aux=next_aux)
        # zero the last row of tran-phase outputs
        mask = jnp.asarray(~zl, jnp.uint32)[:, None]
        last = jnp.zeros((len(cols), h), jnp.uint32).at[:, h - 1].set(1)
        keep = jnp.where(last == 1, mask, jnp.uint32(1))
        return tuple(gf.tmap(lambda p: p * keep, lane) for lane in out)

    import jax.numpy as jnp  # noqa: F401 (captured above)
    return jax.jit(fn), cols


def fill_derived_main_device(main: np.ndarray) -> None:
    """Fill the 230 degree-lowering main columns on device (one compiled
    tape over all substitutions; bit-identical to the host fill)."""
    h = main.shape[0]
    fn, cols = _derived_fill_fn(True, h)
    out = fn(gf.from_u64(np.ascontiguousarray(main.T)), None, None)
    vals = gf.to_u64(out[0])  # base lane (main outputs are base-typed)
    for i, (_, col) in enumerate(cols):
        main[:, col] = vals[i]


def fill_derived_aux_device(main: np.ndarray, aux: np.ndarray,
                            challenges) -> None:
    """Fill the 41 degree-lowering aux columns on device."""
    h = main.shape[0]
    fn, cols = _derived_fill_fn(False, h)
    ch = np.array(challenges, np.uint64)  # (63, 3)
    out = fn(gf.from_u64(np.ascontiguousarray(main.T)),
             tuple(gf.from_u64(np.ascontiguousarray(aux[:, :, c].T))
                   for c in range(3)),
             tuple(gf.from_u64(ch[:, c]) for c in range(3)))
    for c in range(3):
        vals = gf.to_u64(out[c])
        for i, (_, col) in enumerate(cols):
            aux[:, col, c] = vals[i]


# =============================================== device-resident witness
# End-to-end device flow for the prover's cache path on accelerator
# backends: upload the 149 AIR main columns ONCE, compute the 230 derived
# main columns, the 49 aux scan columns, the 41 derived aux columns, and
# the batch-randomizer column all on device, and hand the commit stage
# device-resident (379, h) / (91, h) column arrays. The previous numpy
# interfaces round-tripped the full tables through the host several
# times; on the tunneled TPU transport (~10-80 MB/s) those transfers
# dominated the witness stages (~38 s of the 2^16 prove).


def main_witness_dev(main_np: np.ndarray):
    """numpy (h, 379) main table with AIR columns filled -> device gf
    (379, h) with the 230 derived columns computed on device.
    Bit-identical to fill_derived_main_columns (same tape)."""
    import jax

    h = main_np.shape[0]
    n_air = columns.NUM_MAIN_AIR_COLUMNS
    air = gf.from_u64(np.ascontiguousarray(main_np[:, :n_air].T))
    fn, cols = _derived_fill_fn(True, h)
    tape, _, _ = _derived_fill_tape(True)
    assert tape.main_cols.size == 0 or tape.main_cols.max() < n_air
    idx = np.array([col for _, col in cols], np.int32)
    return _assemble_main_fn(h, n_air)(air, fn(air, None, None)[0],
                                       jax.device_put(idx))


@functools.lru_cache(maxsize=4)
def _assemble_main_fn(h: int, n_air: int):
    import jax
    import jax.numpy as jnp

    from ..tables.master import NUM_MAIN

    def fn(air, derived_base, idx):
        return tuple(
            jnp.zeros((NUM_MAIN, h), jnp.uint32)
            .at[:n_air].set(a).at[idx].set(d)
            for a, d in zip(air, derived_base))

    return jax.jit(fn)


def aux_witness_dev(main_dev, challenges, batch_randomizer: np.ndarray):
    """Device gf main (379, h) -> device gfx triple (91, h): scan columns
    + derived aux columns + the batch-randomizer column (uploaded, tiny).
    Bit-identical to extend + fill_derived_aux_columns + the randomizer
    write (same tapes/scans)."""
    import jax

    from ..tables.master import NUM_AUX

    h = main_dev[0].shape[-1]
    clo, chi = _pack_challenges(challenges)
    packed = _run_pipeline_inputs(
        (main_dev[0], main_dev[1], jax.device_put(clo),
         jax.device_put(chi)))
    fn, cols = _derived_fill_fn(False, h)
    tape, _, _ = _derived_fill_tape(False)
    assert (tape.aux_cols.size == 0
            or tape.aux_cols.max() < columns.NUM_AUX_AIR_COLUMNS)
    idx = np.array([col for _, col in cols], np.int32)
    rand = np.asarray(batch_randomizer, np.uint64)  # (h, 3)
    rand_pair = tuple(_pack_u64(rand[:, c]) for c in range(3))
    ch3 = np.zeros((len(CHALLENGE_NAMES), 3), np.uint64)
    for i, name in enumerate(CHALLENGE_NAMES):
        ch3[i] = challenges[name]
    ch_dev = tuple(gf.from_u64(ch3[:, c]) for c in range(3))
    air3 = tuple((packed[:, c, 0], packed[:, c, 1]) for c in range(3))
    derived = fn(main_dev, air3, ch_dev)
    return _assemble_aux_fn(h)(air3, derived, jax.device_put(idx),
                               tuple(tuple(jax.device_put(p)
                                           for p in rp)
                                     for rp in rand_pair))


@functools.lru_cache(maxsize=4)
def _assemble_aux_fn(h: int):
    import jax
    import jax.numpy as jnp

    from ..tables.master import NUM_AUX

    n_air = columns.NUM_AUX_AIR_COLUMNS

    def fn(air3, derived3, idx, rand3):
        out = []
        for c in range(3):
            planes = tuple(
                jnp.zeros((NUM_AUX, h), jnp.uint32)
                .at[:n_air].set(a).at[idx].set(d).at[NUM_AUX - 1].set(r)
                for a, d, r in zip(air3[c], derived3[c], rand3[c]))
            out.append(planes)
        return tuple(out)

    return jax.jit(fn)
