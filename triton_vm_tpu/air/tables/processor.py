"""Processor table AIR: 46 instructions' constraints via bit deselectors.

Transcribed from /root/reference/triton-air/src/table/processor.rs
(construction order preserved; instruction order = ALL_INSTRUCTIONS,
i.e., the reference enum declaration order).
"""

from . import helpers
from ...fields.bfe import P
from ...isa.instruction import _SPEC

# reference ALL_INSTRUCTIONS order (isa/instruction.rs:31-79)
ALL_INSTRUCTIONS = [
    "pop", "push", "divine", "pick", "place", "dup", "swap", "halt", "nop",
    "skiz", "call", "return", "recurse", "recurse_or_return", "assert",
    "read_mem", "write_mem", "hash", "assert_vector", "sponge_init",
    "sponge_absorb", "sponge_absorb_mem", "sponge_squeeze", "add", "addi",
    "mul", "invert", "eq", "split", "lt", "and", "xor", "log_2_floor", "pow",
    "div_mod", "pop_count", "xx_add", "xx_mul", "x_invert", "xb_mul",
    "read_io", "write_io", "merkle_step", "merkle_step_mem",
    "b_horner_step", "x_horner_step",
]
assert len(ALL_INSTRUCTIONS) == 46 == len(_SPEC)

LEGAL_NUM_WORDS = [1, 2, 3, 4, 5]
ILLEGAL_NUM_WORDS = [0] + list(range(6, 16))

INSTRUCTION_TYPE_WRITE = 0
INSTRUCTION_TYPE_READ = 1
RATE = 10


def _opcode(name):
    return _SPEC[name][0]


def _ib(name, bit):
    return (_opcode(name) >> bit) & 1


class Ctx:
    """Bundles the helper closures for one builder."""

    def __init__(self, b, dual):
        self.b = b
        if dual:
            (self.challenge, self.constant, self.x_constant, self.main,
             self.aux, self.next_main, self.next_aux) = helpers(
                b, "processor", True)
        else:
            (self.challenge, self.constant, self.x_constant, self.main,
             self.aux) = helpers(b, "processor", False)

    def stack_weight(self, i):
        return self.challenge(f"StackWeight{i}")

    def st(self, i):
        return f"ST{i}"


def _indicator_polynomial(c: Ctx, index):
    one = lambda: c.constant(1)
    hv = lambda i: c.main(f"HV{i}")
    bits = [(index >> k) & 1 for k in range(4)]
    # careful: reference builds factors in order hv3, hv2, hv1, hv0
    acc = None
    for k in (3, 2, 1, 0):
        f = hv(k) if bits[k] else (one() - hv(k))
        acc = f if acc is None else acc * f
    return acc


def _instruction_deselector(c: Ctx, name, row_fn):
    one = lambda: c.constant(1)
    acc = one()
    for bit in range(7):
        x_ib = row_fn(f"IB{bit}")
        ib = _ib(name, bit)
        acc = acc * (x_ib * c.constant(ib) + (one() - x_ib) * c.constant(1 - ib))
    return acc


def instruction_deselector_current_row(c: Ctx, name):
    return _instruction_deselector(c, name, c.main)


def instruction_deselector_next_row(c: Ctx, name):
    return _instruction_deselector(c, name, c.next_main)


def instruction_deselector_single_row(c: Ctx, name):
    return _instruction_deselector(c, name, c.main)


# ------------------------------------------------------- constraint groups

def group_decompose_arg(c):
    constant, main = c.constant, c.main
    hv_bits = [main(f"HV{i}") * (main(f"HV{i}") - constant(1)) for i in range(4)]
    nia_decomposition = (main("NIA") - constant(8) * main("HV3")
                         - constant(4) * main("HV2") - constant(2) * main("HV1")
                         - main("HV0"))
    return hv_bits + [nia_decomposition]


def group_no_ram(c):
    return [c.next_aux("RamTablePermArg") - c.aux("RamTablePermArg")]


def group_no_io(c):
    return [input_unchanged(c), output_unchanged(c)]


def input_unchanged(c):
    return c.next_aux("InputTableEvalArg") - c.aux("InputTableEvalArg")


def output_unchanged(c):
    return c.next_aux("OutputTableEvalArg") - c.aux("OutputTableEvalArg")


def group_keep_op_stack_height(c):
    osp_unchanged = c.next_main("OpStackPointer") - c.main("OpStackPointer")
    perm_unchanged = c.next_aux("OpStackTablePermArg") - c.aux("OpStackTablePermArg")
    return [osp_unchanged, perm_unchanged]


def group_op_stack_remains_except_top_n(c, n):
    def compress(row_fn):
        acc = None
        for i in range(16):
            if i < n:
                continue
            term = c.stack_weight(i) * row_fn(f"ST{i}")
            acc = term if acc is None else acc + term
        return acc

    all_but_top_n = compress(c.next_main) - compress(c.main)
    constraints = group_keep_op_stack_height(c)
    constraints.append(all_but_top_n)
    return constraints


def group_keep_op_stack(c):
    return group_op_stack_remains_except_top_n(c, 0)


def group_grow_op_stack_and_top_two_unconstrained(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    out = [next_main(f"ST{i + 1}") - main(f"ST{i}") for i in range(1, 15)]
    out.append(next_main("OpStackPointer") - main("OpStackPointer") - constant(1))
    out.append(rp_op_stack_grow_by(c, 1))
    return out


def group_grow_op_stack(c):
    specific = [c.next_main("ST1") - c.main("ST0")]
    return specific + group_grow_op_stack_and_top_two_unconstrained(c)


def group_op_stack_shrinks_top_three_unconstrained(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    out = [next_main(f"ST{i}") - main(f"ST{i + 1}") for i in range(3, 15)]
    out.append(next_main("OpStackPointer") - main("OpStackPointer") + constant(1))
    out.append(rp_op_stack_shrink_by(c, 1))
    return out


def group_binop(c):
    specific = [c.next_main("ST1") - c.main("ST2"),
                c.next_main("ST2") - c.main("ST3")]
    return specific + group_op_stack_shrinks_top_three_unconstrained(c)


def group_shrink_op_stack(c):
    specific = [c.next_main("ST0") - c.main("ST1")]
    return specific + group_binop(c)


def group_keep_jump_stack(c):
    return [c.next_main("JSP") - c.main("JSP"),
            c.next_main("JSO") - c.main("JSO"),
            c.next_main("JSD") - c.main("JSD")]


def group_step_1(c):
    ip_incr = c.next_main("IP") - c.main("IP") - c.constant(1)
    return group_keep_jump_stack(c) + [ip_incr]


def group_step_2(c):
    ip_incr = c.next_main("IP") - c.main("IP") - c.constant(2)
    return group_keep_jump_stack(c) + [ip_incr]


# ------------------------------------------- op-stack/RAM perm arg factors

def _single_op_stack_factor(c, shorter_row_fn, offset):
    underflow_element = shorter_row_fn(f"ST{15 - offset}")
    op_stack_pointer = shorter_row_fn("OpStackPointer")
    offset_pointer = op_stack_pointer + c.constant(offset)
    compressed = (c.challenge("OpStackClkWeight") * c.main("CLK")
                  + c.challenge("OpStackIb1Weight") * c.main("IB1")
                  + c.challenge("OpStackPointerWeight") * offset_pointer
                  + c.challenge("OpStackFirstUnderflowElementWeight")
                  * underflow_element)
    return c.challenge("OpStackIndeterminate") - compressed


def rp_op_stack_grow_by(c, n):
    factor = c.constant(1)
    for offset in range(n):
        factor = factor * _single_op_stack_factor(c, c.main, offset)
    return c.next_aux("OpStackTablePermArg") - c.aux("OpStackTablePermArg") * factor


def rp_op_stack_shrink_by(c, n):
    factor = c.constant(1)
    for offset in range(n):
        factor = factor * _single_op_stack_factor(c, c.next_main, offset)
    return c.next_aux("OpStackTablePermArg") - c.aux("OpStackTablePermArg") * factor


def _single_ram_factor(c, longer_row_fn, instruction_type, offset):
    ram_value = longer_row_fn(f"ST{offset + 1}")
    additional_offset = 1 if instruction_type == INSTRUCTION_TYPE_READ else 0
    ram_pointer = longer_row_fn("ST0")
    offset_pointer = ram_pointer + c.constant(additional_offset + offset)
    compressed = (c.main("CLK") * c.challenge("RamClkWeight")
                  + c.constant(instruction_type) * c.challenge("RamInstructionTypeWeight")
                  + offset_pointer * c.challenge("RamPointerWeight")
                  + ram_value * c.challenge("RamValueWeight"))
    return c.challenge("RamIndeterminate") - compressed


def rp_ram_write_by(c, n):
    factor = c.constant(1)
    for offset in range(n):
        factor = factor * _single_ram_factor(c, c.main, INSTRUCTION_TYPE_WRITE, offset)
    return c.next_aux("RamTablePermArg") - c.aux("RamTablePermArg") * factor


def rp_ram_read_by(c, n):
    factor = c.constant(1)
    for offset in range(n):
        factor = factor * _single_ram_factor(c, c.next_main, INSTRUCTION_TYPE_READ, offset)
    return c.next_aux("RamTablePermArg") - c.aux("RamTablePermArg") * factor


def read_from_ram_to(c, ram_pointers, destinations):
    """processor.rs:2560-2596 (read_from_ram_to)."""
    factor = None
    for ram_pointer, destination in zip(ram_pointers, destinations):
        compressed = (c.main("CLK") * c.challenge("RamClkWeight")
                      + c.constant(INSTRUCTION_TYPE_READ)
                      * c.challenge("RamInstructionTypeWeight")
                      + ram_pointer * c.challenge("RamPointerWeight")
                      + destination * c.challenge("RamValueWeight"))
        term = c.challenge("RamIndeterminate") - compressed
        factor = term if factor is None else factor * term
    if factor is None:
        factor = c.constant(1)
    return c.aux("RamTablePermArg") * factor - c.next_aux("RamTablePermArg")


# ------------------------------------------------ combining constraint sets

def combine_mutually_exclusive_groups(c, groups):
    num = max((len(g) for g in groups), default=0)
    out = []
    for i in range(num):
        acc = c.constant(0)
        for g in groups:
            if i < len(g):
                acc = acc + g[i]
        out.append(acc)
    return out


def constraints_for_shrinking_stack_by(c, n):
    def compress(items):
        acc = None
        for i, st in enumerate(items):
            term = c.stack_weight(i) * st
            acc = term if acc is None else acc + term
        return acc

    new_stack = [c.next_main(f"ST{i}") for i in range(16 - n)]
    old_stack = [c.main(f"ST{i}") for i in range(n, 16)]
    osp_shrinks = (c.next_main("OpStackPointer") - c.main("OpStackPointer")
                   + c.constant(n))
    stacks_match = compress(new_stack) - compress(old_stack)
    return [osp_shrinks, stacks_match, rp_op_stack_shrink_by(c, n)]


def constraints_for_growing_stack_by(c, n):
    def compress(items):
        acc = None
        for i, st in enumerate(items):
            term = c.stack_weight(i) * st
            acc = term if acc is None else acc + term
        return acc

    new_stack = [c.next_main(f"ST{i}") for i in range(n, 16)]
    old_stack = [c.main(f"ST{i}") for i in range(16 - n)]
    osp_grows = (c.next_main("OpStackPointer") - c.main("OpStackPointer")
                 - c.constant(n))
    stacks_match = compress(new_stack) - compress(old_stack)
    return [osp_grows, stacks_match, rp_op_stack_grow_by(c, n)]


def conditional_shrink(c, n):
    return [_indicator_polynomial(c, n) * x
            for x in constraints_for_shrinking_stack_by(c, n)]


def conditional_grow(c, n):
    return [_indicator_polynomial(c, n) * x
            for x in constraints_for_growing_stack_by(c, n)]


def stack_shrinks_by_any_of(c, values):
    return combine_mutually_exclusive_groups(
        c, [conditional_shrink(c, n) for n in values])


def stack_grows_by_any_of(c, values):
    return combine_mutually_exclusive_groups(
        c, [conditional_grow(c, n) for n in values])


def prohibit_any_illegal_number_of_words(c):
    acc = None
    for n in ILLEGAL_NUM_WORDS:
        term = _indicator_polynomial(c, n)
        acc = term if acc is None else acc + term
    return [acc]


def shrink_stack_by_n_write_n_to_ram(c, n):
    osp_shrinks = (c.next_main("OpStackPointer") - c.main("OpStackPointer")
                   + c.constant(n))
    ram_pointer_grows = c.next_main("ST0") - c.main("ST0") - c.constant(n)
    constraints = [osp_shrinks, ram_pointer_grows,
                   rp_op_stack_shrink_by(c, n), rp_ram_write_by(c, n)]
    for i in range(n + 1, 16):
        constraints.append(c.next_main(f"ST{i - n}") - c.main(f"ST{i}"))
    return constraints


def grow_stack_by_n_read_n_from_ram(c, n):
    osp_grows = (c.next_main("OpStackPointer") - c.main("OpStackPointer")
                 - c.constant(n))
    ram_pointer_shrinks = c.next_main("ST0") - c.main("ST0") + c.constant(n)
    constraints = [osp_grows, ram_pointer_shrinks,
                   rp_op_stack_grow_by(c, n), rp_ram_read_by(c, n)]
    for i in range(1, 16 - n):
        constraints.append(c.next_main(f"ST{i + n}") - c.main(f"ST{i}"))
    return constraints


def write_to_ram_any_of(c, values):
    groups = [[_indicator_polynomial(c, n) * x
               for x in shrink_stack_by_n_write_n_to_ram(c, n)] for n in values]
    return combine_mutually_exclusive_groups(c, groups)


def read_from_ram_any_of(c, values):
    groups = [[_indicator_polynomial(c, n) * x
               for x in grow_stack_by_n_read_n_from_ram(c, n)] for n in values]
    return combine_mutually_exclusive_groups(c, groups)


def grow_stack_by_n_and_read_n_symbols_from_input(c, n):
    running_evaluation = c.aux("InputTableEvalArg")
    for i in reversed(range(n)):
        running_evaluation = (c.challenge("StandardInputIndeterminate")
                              * running_evaluation + c.next_main(f"ST{i}"))
    update = c.next_aux("InputTableEvalArg") - running_evaluation
    conditional_update = _indicator_polynomial(c, n) * update
    constraints = conditional_grow(c, n)
    constraints.append(conditional_update)
    return constraints


def shrink_stack_by_n_and_write_n_symbols_to_output(c, n):
    running_evaluation = c.aux("OutputTableEvalArg")
    for i in range(n):
        running_evaluation = (c.challenge("StandardOutputIndeterminate")
                              * running_evaluation + c.main(f"ST{i}"))
    update = c.next_aux("OutputTableEvalArg") - running_evaluation
    conditional_update = _indicator_polynomial(c, n) * update
    constraints = conditional_shrink(c, n)
    constraints.append(conditional_update)
    return constraints


def xx_product(xs, ys):
    x0, x1, x2 = xs
    y0, y1, y2 = ys
    z0 = x0 * y0
    z1 = x1 * y0 + x0 * y1
    z2 = x2 * y0 + x1 * y1 + x0 * y2
    z3 = x2 * y1 + x1 * y2
    z4 = x2 * y2
    return [z0 - z3, z1 - z4 + z3, z2 + z4]


def xb_product(xs, y):
    x0, x1, x2 = xs
    return [x0 * y, x1 * y, x2 * y]


# -------------------------------------------------- per-instruction rules

def instruction_pop(c):
    return (group_step_2(c) + group_decompose_arg(c)
            + stack_shrinks_by_any_of(c, LEGAL_NUM_WORDS)
            + prohibit_any_illegal_number_of_words(c)
            + group_no_ram(c) + group_no_io(c))


def instruction_push(c):
    specific = [c.next_main("ST0") - c.main("NIA")]
    return (specific + group_grow_op_stack(c) + group_step_2(c)
            + group_no_ram(c) + group_no_io(c))


def instruction_divine(c):
    return (group_step_2(c) + group_decompose_arg(c)
            + stack_grows_by_any_of(c, LEGAL_NUM_WORDS)
            + prohibit_any_illegal_number_of_words(c)
            + group_no_ram(c) + group_no_io(c))


def _compress_full_stack(c, items):
    acc = None
    for i, st in enumerate(items):
        term = c.stack_weight(i) * st
        acc = term if acc is None else acc + term
    return acc


def instruction_pick(c):
    next_stack = [c.next_main(f"ST{i}") for i in range(16)]

    def curr_with_picked(i):
        order = list(range(16))
        moved = order.pop(i)
        order.insert(0, moved)
        return [c.main(f"ST{j}") for j in order]

    acc = None
    for i in range(16):
        term = _indicator_polynomial(c, i) * (
            _compress_full_stack(c, next_stack)
            - _compress_full_stack(c, curr_with_picked(i)))
        acc = term if acc is None else acc + term
    return ([acc] + group_decompose_arg(c) + group_step_2(c)
            + group_no_ram(c) + group_no_io(c) + group_keep_op_stack_height(c))


def instruction_place(c):
    next_stack = [c.next_main(f"ST{i}") for i in range(16)]

    def curr_with_placed(i):
        order = list(range(16))
        moved = order.pop(0)
        order.insert(i, moved)
        return [c.main(f"ST{j}") for j in order]

    acc = None
    for i in range(16):
        term = _indicator_polynomial(c, i) * (
            _compress_full_stack(c, next_stack)
            - _compress_full_stack(c, curr_with_placed(i)))
        acc = term if acc is None else acc + term
    return ([acc] + group_decompose_arg(c) + group_step_2(c)
            + group_no_ram(c) + group_no_io(c) + group_keep_op_stack_height(c))


def instruction_dup(c):
    acc = None
    for i in range(16):
        term = _indicator_polynomial(c, i) * (c.next_main("ST0") - c.main(f"ST{i}"))
        acc = term if acc is None else acc + term
    return ([acc] + group_decompose_arg(c) + group_step_2(c)
            + group_grow_op_stack(c) + group_no_ram(c) + group_no_io(c))


def instruction_swap(c):
    next_stack = [c.next_main(f"ST{i}") for i in range(16)]

    def curr_with_swapped(i):
        order = list(range(16))
        order[0], order[i] = order[i], order[0]
        return [c.main(f"ST{j}") for j in order]

    acc = None
    for i in range(16):
        term = _indicator_polynomial(c, i) * (
            _compress_full_stack(c, next_stack)
            - _compress_full_stack(c, curr_with_swapped(i)))
        acc = term if acc is None else acc + term
    return ([acc] + group_decompose_arg(c) + group_step_2(c)
            + group_no_ram(c) + group_no_io(c) + group_keep_op_stack_height(c))


def instruction_nop(c):
    return (group_step_1(c) + group_keep_op_stack(c)
            + group_no_ram(c) + group_no_io(c))


def instruction_skiz(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    one = lambda: constant(1)

    hv0_inv_st0 = main("HV0") * main("ST0") - one()
    hv0_inv_or_hv0_0 = hv0_inv_st0 * main("HV0")
    hv0_inv_or_st0_0 = hv0_inv_st0 * main("ST0")

    nia_decomposes = (main("NIA") - main("HV1") - constant(2) * main("HV2")
                      - constant(8) * main("HV3") - constant(32) * main("HV4")
                      - constant(128) * main("HV5"))

    ip_case_1 = (next_main("IP") - main("IP") - constant(1)) * main("ST0")
    ip_case_2 = ((next_main("IP") - main("IP") - constant(2))
                 * (main("ST0") * main("HV0") - one())
                 * (main("HV1") - one()))
    ip_case_3 = ((next_main("IP") - main("IP") - constant(3))
                 * (main("ST0") * main("HV0") - one()) * main("HV1"))
    ip_incr = ip_case_1 + ip_case_2 + ip_case_3

    specific = [hv0_inv_or_hv0_0, hv0_inv_or_st0_0, nia_decomposes, ip_incr]

    def is_0_or_1(var):
        return main(var) * (main(var) - constant(1))

    def is_0_to_3(var):
        return (main(var) * (main(var) - constant(1))
                * (main(var) - constant(2)) * (main(var) - constant(3)))

    range_checks = [is_0_or_1("HV1"), is_0_to_3("HV2"), is_0_to_3("HV3"),
                    is_0_to_3("HV4"), is_0_to_3("HV5")]

    return (specific + range_checks + group_keep_jump_stack(c)
            + group_shrink_op_stack(c) + group_no_ram(c) + group_no_io(c))


def instruction_call(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    specific = [
        next_main("JSP") - main("JSP") - constant(1),
        next_main("JSO") - main("IP") - constant(2),
        next_main("JSD") - main("NIA"),
        next_main("IP") - main("NIA"),
    ]
    return (specific + group_keep_op_stack(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_return(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    specific = [
        next_main("JSP") - main("JSP") + constant(1),
        next_main("IP") - main("JSO"),
    ]
    return (specific + group_keep_op_stack(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_recurse(c):
    specific = [c.next_main("IP") - c.main("JSD")]
    return (specific + group_keep_jump_stack(c) + group_keep_op_stack(c)
            + group_no_ram(c) + group_no_io(c))


def instruction_recurse_or_return(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    one = lambda: constant(1)

    def st5_eq_st6():
        return main("HV0") * (main("ST6") - main("ST5"))

    def st5_neq_st6():
        return one() - st5_eq_st6()

    hv0_inv_or_hv0_0 = st5_neq_st6() * main("HV0")
    hv0_inv_or_diff_0 = st5_neq_st6() * (main("ST6") - main("ST5"))
    specific = [hv0_inv_or_hv0_0, hv0_inv_or_diff_0]

    maybe_return = [
        st5_neq_st6() * (next_main("IP") - main("JSO")),
        st5_neq_st6() * (next_main("JSP") - main("JSP") + one()),
    ]
    maybe_recurse = [
        st5_eq_st6() * (next_main("IP") - main("JSD")),
        st5_eq_st6() * (next_main("JSP") - main("JSP")),
        st5_eq_st6() * (next_main("JSO") - main("JSO")),
        st5_eq_st6() * (next_main("JSD") - main("JSD")),
    ]
    specific.extend(combine_mutually_exclusive_groups(
        c, [maybe_return, maybe_recurse]))

    return (specific + group_keep_op_stack(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_assert(c):
    specific = [c.main("ST0") - c.constant(1)]
    return (specific + group_step_1(c) + group_shrink_op_stack(c)
            + group_no_ram(c) + group_no_io(c))


def instruction_halt(c):
    specific = [c.next_main("CI") - c.main("CI")]
    return (specific + group_step_1(c) + group_keep_op_stack(c)
            + group_no_ram(c) + group_no_io(c))


def instruction_read_mem(c):
    return (group_step_2(c) + group_decompose_arg(c)
            + read_from_ram_any_of(c, LEGAL_NUM_WORDS)
            + prohibit_any_illegal_number_of_words(c) + group_no_io(c))


def instruction_write_mem(c):
    return (group_step_2(c) + group_decompose_arg(c)
            + write_to_ram_any_of(c, LEGAL_NUM_WORDS)
            + prohibit_any_illegal_number_of_words(c) + group_no_io(c))


def instruction_hash(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    shrink_5 = [
        next_main("ST5") - main("ST10"),
        next_main("ST6") - main("ST11"),
        next_main("ST7") - main("ST12"),
        next_main("ST8") - main("ST13"),
        next_main("ST9") - main("ST14"),
        next_main("ST10") - main("ST15"),
        next_main("OpStackPointer") - main("OpStackPointer") + constant(5),
        rp_op_stack_shrink_by(c, 5),
    ]
    return (group_step_1(c) + shrink_5 + group_no_ram(c) + group_no_io(c))


def instruction_merkle_step_shared(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    one = lambda: constant(1)
    hv5_bit = main("HV5") * (main("HV5") - one())
    node_index_halves = (constant(2) * next_main("ST5") + main("HV5")
                         - main("ST5"))
    return ([hv5_bit, node_index_halves] + group_step_1(c) + group_no_io(c))


def instruction_merkle_step(c):
    return (instruction_merkle_step_shared(c)
            + group_op_stack_remains_except_top_n(c, 6) + group_no_ram(c))


def instruction_merkle_step_mem(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    ram_pointers = [main("ST7") + constant(i) for i in range(5)]
    destinations = [main(f"HV{i}") for i in range(5)]
    read_to_hvs = read_from_ram_to(c, ram_pointers, destinations)

    st6_unchanged = next_main("ST6") - main("ST6")
    st7_incr_5 = next_main("ST7") - main("ST7") - constant(5)
    st6_st7 = (c.stack_weight(6) * st6_unchanged
               + c.stack_weight(7) * st7_incr_5)
    return ([st6_st7, read_to_hvs] + instruction_merkle_step_shared(c)
            + group_op_stack_remains_except_top_n(c, 8))


def instruction_assert_vector(c):
    main = c.main
    specific = [
        main("ST5") - main("ST0"),
        main("ST6") - main("ST1"),
        main("ST7") - main("ST2"),
        main("ST8") - main("ST3"),
        main("ST9") - main("ST4"),
    ]
    return (specific + group_step_1(c) + constraints_for_shrinking_stack_by(c, 5)
            + group_no_ram(c) + group_no_io(c))


def instruction_sponge_init(c):
    return (group_step_1(c) + group_keep_op_stack(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_sponge_absorb(c):
    return (group_step_1(c) + constraints_for_shrinking_stack_by(c, 10)
            + group_no_ram(c) + group_no_io(c))


def instruction_sponge_absorb_mem(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    increment_ram_pointer = next_main("ST0") - main("ST0") - constant(RATE)
    ram_pointers = [main("ST0") + constant(i) for i in range(10)]
    destinations = [next_main("ST1"), next_main("ST2"), next_main("ST3"),
                    next_main("ST4"), main("HV0"), main("HV1"), main("HV2"),
                    main("HV3"), main("HV4"), main("HV5")]
    read_from_ram = read_from_ram_to(c, ram_pointers, destinations)
    return ([increment_ram_pointer, read_from_ram] + group_step_1(c)
            + group_op_stack_remains_except_top_n(c, 5) + group_no_io(c))


def instruction_sponge_squeeze(c):
    return (group_step_1(c) + constraints_for_growing_stack_by(c, 10)
            + group_no_ram(c) + group_no_io(c))


def instruction_add(c):
    specific = [c.next_main("ST0") - c.main("ST0") - c.main("ST1")]
    return (specific + group_step_1(c) + group_binop(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_addi(c):
    specific = [c.next_main("ST0") - c.main("ST0") - c.main("NIA")]
    return (specific + group_step_2(c)
            + group_op_stack_remains_except_top_n(c, 1) + group_no_ram(c)
            + group_no_io(c))


def instruction_mul(c):
    specific = [c.next_main("ST0") - c.main("ST0") * c.main("ST1")]
    return (specific + group_step_1(c) + group_binop(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_invert(c):
    specific = [c.next_main("ST0") * c.main("ST0") - c.constant(1)]
    return (specific + group_step_1(c)
            + group_op_stack_remains_except_top_n(c, 1) + group_no_ram(c)
            + group_no_io(c))


def instruction_eq(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    one = lambda: constant(1)

    def st0_eq_st1():
        return one() - main("HV0") * (main("ST1") - main("ST0"))

    hv0_inv_or_hv0_0 = main("HV0") * st0_eq_st1()
    hv0_inv_or_diff_0 = (main("ST1") - main("ST0")) * st0_eq_st1()
    st0_becomes_eq = next_main("ST0") - st0_eq_st1()

    specific = [hv0_inv_or_hv0_0, hv0_inv_or_diff_0, st0_becomes_eq]
    return (specific + group_step_1(c) + group_binop(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_split(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    one = lambda: constant(1)
    st0_decomposes = (main("ST0")
                      - (constant(1 << 32) * next_main("ST1") + next_main("ST0")))
    hv0_or_lo_0 = next_main("ST0") * (main("HV0") * (next_main("ST1")
                                                     - constant(0xFFFFFFFF))
                                      - one())
    specific = [st0_decomposes, hv0_or_lo_0]
    return (specific + group_grow_op_stack_and_top_two_unconstrained(c)
            + group_step_1(c) + group_no_ram(c) + group_no_io(c))


def instruction_lt(c):
    return (group_step_1(c) + group_binop(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_and(c):
    return (group_step_1(c) + group_binop(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_xor(c):
    return (group_step_1(c) + group_binop(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_log_2_floor(c):
    return (group_step_1(c) + group_op_stack_remains_except_top_n(c, 1)
            + group_no_ram(c) + group_no_io(c))


def instruction_pow(c):
    return (group_step_1(c) + group_binop(c) + group_no_ram(c)
            + group_no_io(c))


def instruction_div_mod(c):
    specific = [c.main("ST0") - c.main("ST1") * c.next_main("ST1")
                - c.next_main("ST0")]
    return (specific + group_step_1(c)
            + group_op_stack_remains_except_top_n(c, 2) + group_no_ram(c)
            + group_no_io(c))


def instruction_pop_count(c):
    return (group_step_1(c) + group_op_stack_remains_except_top_n(c, 1)
            + group_no_ram(c) + group_no_io(c))


def constraints_shrink_3_top_3_unconstrained(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    return [
        next_main("ST3") - main("ST6"),
        next_main("ST4") - main("ST7"),
        next_main("ST5") - main("ST8"),
        next_main("ST6") - main("ST9"),
        next_main("ST7") - main("ST10"),
        next_main("ST8") - main("ST11"),
        next_main("ST9") - main("ST12"),
        next_main("ST10") - main("ST13"),
        next_main("ST11") - main("ST14"),
        next_main("ST12") - main("ST15"),
        next_main("OpStackPointer") - main("OpStackPointer") + constant(3),
        rp_op_stack_shrink_by(c, 3),
    ]


def instruction_xx_add(c):
    main, next_main = c.main, c.next_main
    specific = [
        next_main("ST0") - main("ST0") - main("ST3"),
        next_main("ST1") - main("ST1") - main("ST4"),
        next_main("ST2") - main("ST2") - main("ST5"),
    ]
    return (specific + constraints_shrink_3_top_3_unconstrained(c)
            + group_step_1(c) + group_no_ram(c) + group_no_io(c))


def instruction_xx_mul(c):
    main, next_main = c.main, c.next_main
    xs = [main("ST0"), main("ST1"), main("ST2")]
    ys = [main("ST3"), main("ST4"), main("ST5")]
    c0, c1, c2 = xx_product(xs, ys)
    specific = [next_main("ST0") - c0, next_main("ST1") - c1,
                next_main("ST2") - c2]
    return (specific + constraints_shrink_3_top_3_unconstrained(c)
            + group_step_1(c) + group_no_ram(c) + group_no_io(c))


def instruction_x_invert(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    first = (main("ST0") * next_main("ST0")
             - main("ST2") * next_main("ST1")
             - main("ST1") * next_main("ST2") - constant(1))
    second = (main("ST1") * next_main("ST0")
              + main("ST0") * next_main("ST1")
              - main("ST2") * next_main("ST2")
              + main("ST2") * next_main("ST1")
              + main("ST1") * next_main("ST2"))
    third = (main("ST2") * next_main("ST0")
             + main("ST1") * next_main("ST1")
             + main("ST0") * next_main("ST2")
             + main("ST2") * next_main("ST2"))
    specific = [first, second, third]
    return (specific + group_op_stack_remains_except_top_n(c, 3)
            + group_step_1(c) + group_no_ram(c) + group_no_io(c))


def instruction_xb_mul(c):
    main, next_main = c.main, c.next_main
    x = main("ST0")
    ys = [main("ST1"), main("ST2"), main("ST3")]
    c0, c1, c2 = xb_product(ys, x)
    specific = [next_main("ST0") - c0, next_main("ST1") - c1,
                next_main("ST2") - c2]
    return (specific + group_op_stack_shrinks_top_three_unconstrained(c)
            + group_step_1(c) + group_no_ram(c) + group_no_io(c))


def instruction_read_io(c):
    groups = [grow_stack_by_n_and_read_n_symbols_from_input(c, n)
              for n in LEGAL_NUM_WORDS]
    read_any = combine_mutually_exclusive_groups(c, groups)
    return (group_step_2(c) + group_decompose_arg(c) + read_any
            + prohibit_any_illegal_number_of_words(c) + group_no_ram(c)
            + [output_unchanged(c)])


def instruction_write_io(c):
    groups = [shrink_stack_by_n_and_write_n_symbols_to_output(c, n)
              for n in LEGAL_NUM_WORDS]
    write_any = combine_mutually_exclusive_groups(c, groups)
    return (group_step_2(c) + group_decompose_arg(c) + write_any
            + prohibit_any_illegal_number_of_words(c) + group_no_ram(c)
            + [input_unchanged(c)])


def instruction_b_horner_step(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    read_from_ram = read_from_ram_to(c, [main("ST5")], [main("HV0")])

    indeterminate = [main("ST0"), main("ST1"), main("ST2")]
    evaluation = [main("ST7"), main("ST8"), main("ST9")]
    product_0, product_1, product_2 = xx_product(indeterminate, evaluation)

    curr_compressed = (c.stack_weight(0) * main("ST0")
                       + c.stack_weight(1) * main("ST1")
                       + c.stack_weight(2) * main("ST2")
                       + c.stack_weight(3) * main("ST3")
                       + c.stack_weight(4) * main("ST4")
                       + c.stack_weight(5) * (main("ST5") - constant(1))
                       + c.stack_weight(6) * main("ST6")
                       + c.stack_weight(7) * (product_0 + main("HV0"))
                       + c.stack_weight(8) * product_1
                       + c.stack_weight(9) * product_2)
    next_compressed = None
    for i in range(10):
        term = c.stack_weight(i) * next_main(f"ST{i}")
        next_compressed = term if next_compressed is None else next_compressed + term
    stack_changes = next_compressed - curr_compressed

    return ([stack_changes, read_from_ram] + group_no_io(c) + group_step_1(c)
            + group_op_stack_remains_except_top_n(c, 10))


def instruction_x_horner_step(c):
    constant, main, next_main = c.constant, c.main, c.next_main
    ram_pointers = [main("ST5") - constant(i) for i in range(3)]
    read_from_ram = read_from_ram_to(
        c, ram_pointers, [main("HV2"), main("HV1"), main("HV0")])

    indeterminate = [main("ST0"), main("ST1"), main("ST2")]
    evaluation = [main("ST7"), main("ST8"), main("ST9")]
    product_0, product_1, product_2 = xx_product(indeterminate, evaluation)

    curr_compressed = (c.stack_weight(0) * main("ST0")
                       + c.stack_weight(1) * main("ST1")
                       + c.stack_weight(2) * main("ST2")
                       + c.stack_weight(3) * main("ST3")
                       + c.stack_weight(4) * main("ST4")
                       + c.stack_weight(5) * (main("ST5") - constant(3))
                       + c.stack_weight(6) * main("ST6")
                       + c.stack_weight(7) * (product_0 + main("HV0"))
                       + c.stack_weight(8) * (product_1 + main("HV1"))
                       + c.stack_weight(9) * (product_2 + main("HV2")))
    next_compressed = None
    for i in range(10):
        term = c.stack_weight(i) * next_main(f"ST{i}")
        next_compressed = term if next_compressed is None else next_compressed + term
    stack_changes = next_compressed - curr_compressed

    return ([stack_changes, read_from_ram] + group_no_io(c) + group_step_1(c)
            + group_op_stack_remains_except_top_n(c, 10))


_INSTRUCTION_RULES = {
    "pop": instruction_pop, "push": instruction_push,
    "divine": instruction_divine, "pick": instruction_pick,
    "place": instruction_place, "dup": instruction_dup,
    "swap": instruction_swap, "halt": instruction_halt,
    "nop": instruction_nop, "skiz": instruction_skiz,
    "call": instruction_call, "return": instruction_return,
    "recurse": instruction_recurse,
    "recurse_or_return": instruction_recurse_or_return,
    "assert": instruction_assert, "read_mem": instruction_read_mem,
    "write_mem": instruction_write_mem, "hash": instruction_hash,
    "assert_vector": instruction_assert_vector,
    "sponge_init": instruction_sponge_init,
    "sponge_absorb": instruction_sponge_absorb,
    "sponge_absorb_mem": instruction_sponge_absorb_mem,
    "sponge_squeeze": instruction_sponge_squeeze,
    "add": instruction_add, "addi": instruction_addi,
    "mul": instruction_mul, "invert": instruction_invert,
    "eq": instruction_eq, "split": instruction_split,
    "lt": instruction_lt, "and": instruction_and, "xor": instruction_xor,
    "log_2_floor": instruction_log_2_floor, "pow": instruction_pow,
    "div_mod": instruction_div_mod, "pop_count": instruction_pop_count,
    "xx_add": instruction_xx_add, "xx_mul": instruction_xx_mul,
    "x_invert": instruction_x_invert, "xb_mul": instruction_xb_mul,
    "read_io": instruction_read_io, "write_io": instruction_write_io,
    "merkle_step": instruction_merkle_step,
    "merkle_step_mem": instruction_merkle_step_mem,
    "b_horner_step": instruction_b_horner_step,
    "x_horner_step": instruction_x_horner_step,
}


# ------------------------------------------------- table-linking constraints

def log_derivative_accumulates_clk_next(c):
    return ((c.next_aux("ClockJumpDifferenceLookupServerLogDerivative")
             - c.aux("ClockJumpDifferenceLookupServerLogDerivative"))
            * (c.challenge("ClockJumpDifferenceLookupIndeterminate")
               - c.next_main("CLK"))
            - c.next_main("ClockJumpDifferenceLookupMultiplicity"))


def log_derivative_for_instruction_lookup(c):
    one = lambda: c.constant(1)
    compressed_row = (c.challenge("ProgramAddressWeight") * c.next_main("IP")
                      + c.challenge("ProgramInstructionWeight") * c.next_main("CI")
                      + c.challenge("ProgramNextInstructionWeight")
                      * c.next_main("NIA"))
    updates = ((c.next_aux("InstructionLookupClientLogDerivative")
                - c.aux("InstructionLookupClientLogDerivative"))
               * (c.challenge("InstructionLookupIndeterminate") - compressed_row)
               - one())
    remains = (c.next_aux("InstructionLookupClientLogDerivative")
               - c.aux("InstructionLookupClientLogDerivative"))
    return ((one() - c.next_main("IsPadding")) * updates
            + c.next_main("IsPadding") * remains)


def rp_jump_stack_updates(c):
    compressed_row = (c.challenge("JumpStackClkWeight") * c.next_main("CLK")
                      + c.challenge("JumpStackCiWeight") * c.next_main("CI")
                      + c.challenge("JumpStackJspWeight") * c.next_main("JSP")
                      + c.challenge("JumpStackJsoWeight") * c.next_main("JSO")
                      + c.challenge("JumpStackJsdWeight") * c.next_main("JSD"))
    return (c.next_aux("JumpStackTablePermArg")
            - c.aux("JumpStackTablePermArg")
            * (c.challenge("JumpStackIndeterminate") - compressed_row))


def running_evaluation_hash_input_updates(c):
    constant = c.constant
    one = lambda: constant(1)
    hash_deselector = instruction_deselector_next_row(c, "hash")
    merkle_step_deselector = instruction_deselector_next_row(c, "merkle_step")
    merkle_step_mem_deselector = instruction_deselector_next_row(
        c, "merkle_step_mem")
    selector = ((c.next_main("CI") - constant(_opcode("hash")))
                * (c.next_main("CI") - constant(_opcode("merkle_step")))
                * (c.next_main("CI") - constant(_opcode("merkle_step_mem"))))

    compressed_hash_row = None
    for i in range(10):
        term = c.stack_weight(i) * c.next_main(f"ST{i}")
        compressed_hash_row = (term if compressed_hash_row is None
                               else compressed_hash_row + term)

    is_left = lambda: c.next_main("HV5")
    is_right = lambda: one() - c.next_main("HV5")

    def ms_elem(l, r):
        return is_right() * c.next_main(l) + is_left() * c.next_main(r)

    state_ms = [ms_elem("ST0", "HV0"), ms_elem("ST1", "HV1"),
                ms_elem("ST2", "HV2"), ms_elem("ST3", "HV3"),
                ms_elem("ST4", "HV4"), ms_elem("HV0", "ST0"),
                ms_elem("HV1", "ST1"), ms_elem("HV2", "ST2"),
                ms_elem("HV3", "ST3"), ms_elem("HV4", "ST4")]
    compressed_ms_row = None
    for i, st in enumerate(state_ms):
        term = c.stack_weight(i) * st
        compressed_ms_row = term if compressed_ms_row is None else compressed_ms_row + term

    def updates_with(compressed_row):
        return (c.next_aux("HashInputEvalArg")
                - c.challenge("HashInputIndeterminate") * c.aux("HashInputEvalArg")
                - compressed_row)

    remains = c.next_aux("HashInputEvalArg") - c.aux("HashInputEvalArg")

    return (selector * remains
            + hash_deselector * updates_with(compressed_hash_row)
            + merkle_step_deselector * updates_with(compressed_ms_row)
            + merkle_step_mem_deselector * updates_with(compressed_ms_row))


def running_evaluation_hash_digest_updates(c):
    constant = c.constant
    hash_deselector = instruction_deselector_current_row(c, "hash")
    merkle_step_deselector = instruction_deselector_current_row(c, "merkle_step")
    merkle_step_mem_deselector = instruction_deselector_current_row(
        c, "merkle_step_mem")
    selector = ((c.main("CI") - constant(_opcode("hash")))
                * (c.main("CI") - constant(_opcode("merkle_step")))
                * (c.main("CI") - constant(_opcode("merkle_step_mem"))))

    compressed_row = None
    for i in range(5):
        term = c.stack_weight(i) * c.next_main(f"ST{i}")
        compressed_row = term if compressed_row is None else compressed_row + term

    updates = (c.next_aux("HashDigestEvalArg")
               - c.challenge("HashDigestIndeterminate") * c.aux("HashDigestEvalArg")
               - compressed_row)
    remains = c.next_aux("HashDigestEvalArg") - c.aux("HashDigestEvalArg")

    return (selector * remains
            + (hash_deselector + merkle_step_deselector
               + merkle_step_mem_deselector) * updates)


def running_evaluation_sponge_updates(c):
    constant = c.constant
    sponge_init_deselector = instruction_deselector_current_row(c, "sponge_init")
    sponge_absorb_deselector = instruction_deselector_current_row(
        c, "sponge_absorb")
    sponge_absorb_mem_deselector = instruction_deselector_current_row(
        c, "sponge_absorb_mem")
    sponge_squeeze_deselector = instruction_deselector_current_row(
        c, "sponge_squeeze")

    selector = ((c.main("CI") - constant(_opcode("sponge_init")))
                * (c.main("CI") - constant(_opcode("sponge_absorb")))
                * (c.main("CI") - constant(_opcode("sponge_absorb_mem")))
                * (c.main("CI") - constant(_opcode("sponge_squeeze"))))

    def weighted_sum(row_fn):
        acc = None
        for i in range(10):
            term = c.stack_weight(i) * row_fn(f"ST{i}")
            acc = term if acc is None else acc + term
        return acc

    compressed_current = weighted_sum(c.main)
    compressed_next = weighted_sum(c.next_main)

    updates_init = (c.next_aux("SpongeEvalArg")
                    - c.challenge("SpongeIndeterminate") * c.aux("SpongeEvalArg")
                    - c.challenge("HashCIWeight") * c.main("CI"))
    updates_absorb = updates_init - compressed_current
    updates_squeeze = updates_init - compressed_next
    remains = c.next_aux("SpongeEvalArg") - c.aux("SpongeEvalArg")

    absorb_mem_elements = [c.next_main("ST1"), c.next_main("ST2"),
                           c.next_main("ST3"), c.next_main("ST4"),
                           c.main("HV0"), c.main("HV1"), c.main("HV2"),
                           c.main("HV3"), c.main("HV4"), c.main("HV5")]
    compressed_absorb_mem = None
    for i, st in enumerate(absorb_mem_elements):
        term = c.stack_weight(i) * st
        compressed_absorb_mem = (term if compressed_absorb_mem is None
                                 else compressed_absorb_mem + term)
    updates_absorb_mem = (c.next_aux("SpongeEvalArg")
                          - c.challenge("SpongeIndeterminate") * c.aux("SpongeEvalArg")
                          - c.challenge("HashCIWeight")
                          * constant(_opcode("sponge_absorb"))
                          - compressed_absorb_mem)

    return (selector * remains
            + sponge_init_deselector * updates_init
            + sponge_absorb_deselector * updates_absorb
            + sponge_absorb_mem_deselector * updates_absorb_mem
            + sponge_squeeze_deselector * updates_squeeze)


def log_derivative_with_u32_updates(c):
    constant = c.constant
    one = lambda: constant(1)
    two_inverse = constant(pow(2, P - 2, P))

    split_deselector = instruction_deselector_current_row(c, "split")
    lt_deselector = instruction_deselector_current_row(c, "lt")
    and_deselector = instruction_deselector_current_row(c, "and")
    xor_deselector = instruction_deselector_current_row(c, "xor")
    pow_deselector = instruction_deselector_current_row(c, "pow")
    log_2_floor_deselector = instruction_deselector_current_row(c, "log_2_floor")
    div_mod_deselector = instruction_deselector_current_row(c, "div_mod")
    pop_count_deselector = instruction_deselector_current_row(c, "pop_count")
    merkle_step_deselector = instruction_deselector_current_row(c, "merkle_step")
    merkle_step_mem_deselector = instruction_deselector_current_row(
        c, "merkle_step_mem")

    running_sum = c.aux("U32LookupClientLogDerivative")
    running_sum_next = c.next_aux("U32LookupClientLogDerivative")

    split_factor = (c.challenge("U32Indeterminate")
                    - c.challenge("U32LhsWeight") * c.next_main("ST0")
                    - c.challenge("U32RhsWeight") * c.next_main("ST1")
                    - c.challenge("U32CiWeight") * c.main("CI"))
    binop_factor = (c.challenge("U32Indeterminate")
                    - c.challenge("U32LhsWeight") * c.main("ST0")
                    - c.challenge("U32RhsWeight") * c.main("ST1")
                    - c.challenge("U32CiWeight") * c.main("CI")
                    - c.challenge("U32ResultWeight") * c.next_main("ST0"))
    xor_factor = (c.challenge("U32Indeterminate")
                  - c.challenge("U32LhsWeight") * c.main("ST0")
                  - c.challenge("U32RhsWeight") * c.main("ST1")
                  - c.challenge("U32CiWeight") * constant(_opcode("and"))
                  - c.challenge("U32ResultWeight")
                  * (c.main("ST0") + c.main("ST1") - c.next_main("ST0"))
                  * two_inverse)
    unop_factor = (c.challenge("U32Indeterminate")
                   - c.challenge("U32LhsWeight") * c.main("ST0")
                   - c.challenge("U32CiWeight") * c.main("CI")
                   - c.challenge("U32ResultWeight") * c.next_main("ST0"))
    div_mod_factor_for_lt = (c.challenge("U32Indeterminate")
                             - c.challenge("U32LhsWeight") * c.next_main("ST0")
                             - c.challenge("U32RhsWeight") * c.main("ST1")
                             - c.challenge("U32CiWeight") * constant(_opcode("lt"))
                             - c.challenge("U32ResultWeight"))
    div_mod_factor_for_range_check = (
        c.challenge("U32Indeterminate")
        - c.challenge("U32LhsWeight") * c.main("ST0")
        - c.challenge("U32RhsWeight") * c.next_main("ST1")
        - c.challenge("U32CiWeight") * constant(_opcode("split")))
    merkle_step_factor = (
        c.challenge("U32Indeterminate")
        - c.challenge("U32LhsWeight") * c.main("ST5")
        - c.challenge("U32RhsWeight") * c.next_main("ST5")
        - c.challenge("U32CiWeight") * constant(_opcode("split")))

    absorbs_split = (running_sum_next - running_sum) * split_factor - one()
    absorbs_binop = (running_sum_next - running_sum) * binop_factor - one()
    absorbs_xor = (running_sum_next - running_sum) * xor_factor - one()
    absorbs_unop = (running_sum_next - running_sum) * unop_factor - one()
    absorbs_merkle = (running_sum_next - running_sum) * merkle_step_factor - one()

    split_summand = split_deselector * absorbs_split
    lt_summand = lt_deselector * absorbs_binop
    and_summand = and_deselector * absorbs_binop
    xor_summand = xor_deselector * absorbs_xor
    pow_summand = pow_deselector * absorbs_binop
    log_2_floor_summand = log_2_floor_deselector * absorbs_unop
    div_mod_summand = div_mod_deselector * (
        (running_sum_next - running_sum)
        * div_mod_factor_for_lt * div_mod_factor_for_range_check
        - div_mod_factor_for_lt - div_mod_factor_for_range_check)
    pop_count_summand = pop_count_deselector * absorbs_unop
    merkle_step_summand = merkle_step_deselector * absorbs_merkle
    merkle_step_mem_summand = merkle_step_mem_deselector * absorbs_merkle
    no_update_summand = (one() - c.main("IB2")) * (running_sum_next - running_sum)

    return (split_summand + lt_summand + and_summand + xor_summand
            + pow_summand + log_2_floor_summand + div_mod_summand
            + pop_count_summand + merkle_step_summand
            + merkle_step_mem_summand + no_update_summand)


# --------------------------------------------------------------- interface

def initial_constraints(b):
    c = Ctx(b, False)
    constant, challenge, main, aux = c.constant, c.challenge, c.main, c.aux

    clk_is_0 = main("CLK")
    ip_is_0 = main("IP")
    jsp_is_0 = main("JSP")
    jso_is_0 = main("JSO")
    jsd_is_0 = main("JSD")
    sts = [main(f"ST{i}") for i in range(11)]
    op_stack_pointer_is_16 = main("OpStackPointer") - constant(16)

    compressed_digest = constant(1)
    for i in range(11, 16):
        compressed_digest = (compressed_digest
                             * challenge("CompressProgramDigestIndeterminate")
                             + main(f"ST{i}"))
    digest_matches = compressed_digest - challenge("CompressedProgramDigest")

    input_eval_init = aux("InputTableEvalArg") - constant(1)

    compressed_lookup_row = (challenge("ProgramInstructionWeight") * main("CI")
                             + challenge("ProgramNextInstructionWeight")
                             * main("NIA"))
    instruction_lookup_init = (
        (aux("InstructionLookupClientLogDerivative") - constant(0))
        * (challenge("InstructionLookupIndeterminate") - compressed_lookup_row)
        - constant(1))

    output_eval_init = aux("OutputTableEvalArg") - constant(1)
    op_stack_perm_init = aux("OpStackTablePermArg") - constant(1)
    ram_perm_init = aux("RamTablePermArg") - constant(1)

    compressed_jump_stack = challenge("JumpStackCiWeight") * main("CI")
    jump_stack_perm_init = (aux("JumpStackTablePermArg")
                            - constant(1)
                            * (challenge("JumpStackIndeterminate")
                               - compressed_jump_stack))

    cjd_init = (aux("ClockJumpDifferenceLookupServerLogDerivative")
                * challenge("ClockJumpDifferenceLookupIndeterminate")
                - main("ClockJumpDifferenceLookupMultiplicity"))

    hash_selector = main("CI") - constant(_opcode("hash"))
    hash_deselector = instruction_deselector_single_row(c, "hash")
    hash_input_absorbed = (aux("HashInputEvalArg")
                           - challenge("HashInputIndeterminate") * constant(1)
                           - constant(0))
    hash_input_default = aux("HashInputEvalArg") - constant(1)
    hash_input_init = (hash_selector * hash_input_default
                       + hash_deselector * hash_input_absorbed)

    hash_digest_init = aux("HashDigestEvalArg") - constant(1)
    sponge_init = aux("SpongeEvalArg") - constant(1)
    u32_init = aux("U32LookupClientLogDerivative") - constant(0)

    return ([clk_is_0, ip_is_0, jsp_is_0, jso_is_0, jsd_is_0] + sts
            + [digest_matches, op_stack_pointer_is_16, input_eval_init,
               instruction_lookup_init, output_eval_init, op_stack_perm_init,
               ram_perm_init, jump_stack_perm_init, cjd_init, hash_input_init,
               hash_digest_init, sponge_init, u32_init])


def consistency_constraints(b):
    c = Ctx(b, False)
    constant, main = c.constant, c.main

    ib_composition = None
    for bit in range(7):
        term = (main("IB0") if bit == 0
                else constant(1 << bit) * main(f"IB{bit}"))
        ib_composition = term if ib_composition is None else ib_composition + term
    ci_matches = main("CI") - ib_composition

    ib_bits = [main(f"IB{i}") * (main(f"IB{i}") - constant(1)) for i in range(7)]
    is_padding_bit = main("IsPadding") * (main("IsPadding") - constant(1))
    cjd_mult_0_in_padding = (main("IsPadding") * (main("CLK") - constant(1))
                             * main("ClockJumpDifferenceLookupMultiplicity"))

    return ib_bits + [is_padding_bit, ci_matches, cjd_mult_0_in_padding]


def transition_constraints(b):
    c = Ctx(b, True)
    constant = c.constant

    clk_increases = c.next_main("CLK") - c.main("CLK") - constant(1)
    padding_stays = c.main("IsPadding") * (c.next_main("IsPadding")
                                           - c.main("IsPadding"))

    all_deselectors = [instruction_deselector_current_row(c, name)
                       for name in ALL_INSTRUCTIONS]
    deselector_sum = constant(0)
    for d in all_deselectors:
        deselector_sum = deselector_sum + d
    exactly_one_active = deselector_sum - constant(1)

    instruction_independent = [clk_increases, padding_stays, exactly_one_active]

    all_rules = [_INSTRUCTION_RULES[name](c) for name in ALL_INSTRUCTIONS]

    # combine with deselectors, transposed (processor.rs:385-418)
    max_len = max(len(r) for r in all_rules)
    zero = constant(0)
    deselected = []
    for idx in range(max_len):
        acc = None
        for deselector, rules in zip(all_deselectors, all_rules):
            tc = rules[idx] if idx < len(rules) else zero
            term = deselector * tc
            acc = term if acc is None else acc + term
        deselected.append(acc)

    # padding-row constraints (processor.rs:420-465)
    padding_constraints = (
        [c.next_main("IP") - c.main("IP"),
         c.next_main("CI") - c.main("CI"),
         c.next_main("NIA") - c.main("NIA")]
        + group_keep_jump_stack(c)
        + group_keep_op_stack(c)
        + group_no_ram(c)
        + group_no_io(c))

    padding_row_deselector = constant(1) - c.next_main("IsPadding")
    padding_row_selector = c.next_main("IsPadding")

    n = max(len(deselected), len(padding_constraints))
    doubly_deselected = []
    for idx in range(n):
        ic = deselected[idx] if idx < len(deselected) else constant(0)
        pc = padding_constraints[idx] if idx < len(padding_constraints) else constant(0)
        doubly_deselected.append(ic * padding_row_deselector
                                 + pc * padding_row_selector)

    table_linking = [
        log_derivative_accumulates_clk_next(c),
        log_derivative_for_instruction_lookup(c),
        rp_jump_stack_updates(c),
        running_evaluation_hash_input_updates(c),
        running_evaluation_hash_digest_updates(c),
        running_evaluation_sponge_updates(c),
        log_derivative_with_u32_updates(c),
    ]

    return instruction_independent + doubly_deselected + table_linking


def terminal_constraints(b):
    c = Ctx(b, False)
    return [c.main("CI") - c.constant(_opcode("halt"))]
