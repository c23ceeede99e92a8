"""U32 table AIR.

Transcribed from /root/reference/triton-air/src/table/u32.rs.
"""

from . import helpers
from ...isa.instruction import Instruction

SPLIT = Instruction("split").opcode
LT = Instruction("lt").opcode
AND = Instruction("and").opcode
LOG2FLOOR = Instruction("log_2_floor").opcode
POW = Instruction("pow").opcode
POPCOUNT = Instruction("pop_count").opcode

_U32_OPCODES = [SPLIT, LT, AND, LOG2FLOOR, POW, POPCOUNT]


def _instruction_deselector(b, constant, opcode_to_select, ci):
    """Product over the other five u32 opcodes of (ci - opcode)."""
    acc = constant(1)
    for opcode in _U32_OPCODES:
        if opcode != opcode_to_select:
            acc = acc * (ci - constant(opcode))
    return acc


def initial_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "u32", False)
    one = constant(1)

    copy_flag = main("CopyFlag")
    lhs = main("LHS")
    rhs = main("RHS")
    ci = main("CI")
    result = main("Result")
    lookup_multiplicity = main("LookupMultiplicity")
    running_sum_log_derivative = aux("LookupServerLogDerivative")

    compressed_row = (challenge("U32LhsWeight") * lhs
                      + challenge("U32RhsWeight") * rhs
                      + challenge("U32CiWeight") * ci
                      + challenge("U32ResultWeight") * result)
    accumulated_first_row = copy_flag * (
        running_sum_log_derivative
        * (challenge("U32Indeterminate") - compressed_row)
        - lookup_multiplicity)

    default_initial = constant(0)
    is_default_initial = (copy_flag - one) * (running_sum_log_derivative
                                              - default_initial)
    starts_correctly = is_default_initial + accumulated_first_row

    return [starts_correctly]


def consistency_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "u32", False)

    def one():
        return constant(1)

    def two():
        return constant(2)

    copy_flag = main("CopyFlag")
    bits = main("Bits")
    bits_minus_33_inv = main("BitsMinus33Inv")
    ci = main("CI")
    lhs = main("LHS")
    lhs_inv = main("LhsInv")
    rhs = main("RHS")
    rhs_inv = main("RhsInv")
    result = main("Result")
    lookup_multiplicity = main("LookupMultiplicity")

    def desel(opcode):
        return _instruction_deselector(b, constant, opcode, ci)

    copy_flag_is_bit = copy_flag * (one() - copy_flag)
    copy_flag_is_0_or_bits_is_0 = copy_flag * bits
    bits_minus_33_inv_is_inverse = one() - bits_minus_33_inv * (bits - constant(33))
    lhs_inv_is_0_or_inverse = lhs_inv * (one() - lhs * lhs_inv)
    lhs_is_0_or_inverse = lhs * (one() - lhs * lhs_inv)
    rhs_inv_is_0_or_inverse = rhs_inv * (one() - rhs * rhs_inv)
    rhs_is_0_or_inverse = rhs * (one() - rhs * rhs_inv)
    lt_result_copy_flag_0 = (desel(LT) * (copy_flag - one())
                             * (one() - lhs * lhs_inv)
                             * (one() - rhs * rhs_inv)
                             * (result - two()))
    lt_result_copy_flag_1 = (desel(LT) * copy_flag
                             * (one() - lhs * lhs_inv)
                             * (one() - rhs * rhs_inv)
                             * result)
    and_result = (desel(AND) * (one() - lhs * lhs_inv)
                  * (one() - rhs * rhs_inv) * result)
    pow_result = desel(POW) * (one() - rhs * rhs_inv) * (result - one())
    log2floor_result = (desel(LOG2FLOOR) * (copy_flag - one())
                        * (one() - lhs * lhs_inv) * (result + one()))
    popcount_result = (desel(POPCOUNT) * (one() - lhs * lhs_inv) * result)
    log2floor_of_0_crashes = (desel(LOG2FLOOR) * copy_flag
                              * (one() - lhs * lhs_inv))
    copy_flag_0_no_multiplicity = (copy_flag - one()) * lookup_multiplicity

    return [copy_flag_is_bit, copy_flag_is_0_or_bits_is_0,
            bits_minus_33_inv_is_inverse, lhs_inv_is_0_or_inverse,
            lhs_is_0_or_inverse, rhs_inv_is_0_or_inverse, rhs_is_0_or_inverse,
            lt_result_copy_flag_0, lt_result_copy_flag_1, and_result,
            pow_result, log2floor_result, popcount_result,
            log2floor_of_0_crashes, copy_flag_0_no_multiplicity]


def transition_constraints(b):
    challenge, constant, x_constant, main, aux, next_main, next_aux = \
        helpers(b, "u32", True)

    def one():
        return constant(1)

    def two():
        return constant(2)

    copy_flag = main("CopyFlag")
    bits = main("Bits")
    ci = main("CI")
    lhs = main("LHS")
    rhs = main("RHS")
    result = main("Result")
    running_sum_log_derivative = aux("LookupServerLogDerivative")

    copy_flag_next = next_main("CopyFlag")
    bits_next = next_main("Bits")
    ci_next = next_main("CI")
    lhs_next = next_main("LHS")
    rhs_next = next_main("RHS")
    result_next = next_main("Result")
    lhs_inv_next = next_main("LhsInv")
    lookup_multiplicity_next = next_main("LookupMultiplicity")
    running_sum_log_derivative_next = next_aux("LookupServerLogDerivative")

    def desel(opcode):
        return _instruction_deselector(b, constant, opcode, ci_next)

    ci_is_pow = ci - constant(POW)
    lhs_lsb = lhs - two() * lhs_next
    rhs_lsb = rhs - two() * rhs_next

    cf1_lhs_0_or_pow = copy_flag_next * lhs * ci_is_pow
    cf1_rhs_0 = copy_flag_next * rhs
    cf0_ci_stays = (copy_flag_next - one()) * (ci_next - ci)
    cf0_lhs_bits_inc = ((copy_flag_next - one()) * lhs * ci_is_pow
                        * (bits_next - bits - one()))
    cf0_rhs_bits_inc = (copy_flag_next - one()) * rhs * (bits_next - bits - one())
    cf0_lhs_lsb_is_bit = ((copy_flag_next - one()) * ci_is_pow
                          * lhs_lsb * (lhs_lsb - one()))
    cf0_rhs_lsb_is_bit = (copy_flag_next - one()) * rhs_lsb * (rhs_lsb - one())

    lt_r0 = ((copy_flag_next - one()) * desel(LT) * (result_next - one())
             * (result_next - two()) * result)
    lt_r1 = ((copy_flag_next - one()) * desel(LT) * result_next
             * (result_next - two()) * (result - one()))
    lt_r2_lt0 = ((copy_flag_next - one()) * desel(LT) * result_next
                 * (result_next - one()) * (lhs_lsb - one()) * rhs_lsb
                 * (result - one()))
    lt_r2_lt1 = ((copy_flag_next - one()) * desel(LT) * result_next
                 * (result_next - one()) * lhs_lsb * (rhs_lsb - one())
                 * result)
    lt_r2_unknown = ((copy_flag_next - one()) * desel(LT) * result_next
                     * (result_next - one())
                     * (one() - lhs_lsb - rhs_lsb + two() * lhs_lsb * rhs_lsb)
                     * (copy_flag - one()) * (result - two()))
    lt_r2_copyflag = ((copy_flag_next - one()) * desel(LT) * result_next
                      * (result_next - one())
                      * (one() - lhs_lsb - rhs_lsb + two() * lhs_lsb * rhs_lsb)
                      * copy_flag * result)

    and_updates = ((copy_flag_next - one()) * desel(AND)
                   * (result - two() * result_next - lhs_lsb * rhs_lsb))

    log2floor_sets = ((copy_flag_next - one()) * desel(LOG2FLOOR)
                      * (one() - lhs_next * lhs_inv_next) * lhs
                      * (result - bits))
    log2floor_copies = ((copy_flag_next - one()) * desel(LOG2FLOOR)
                        * lhs_next * (result_next - result))

    pow_lhs_unchanged = ((copy_flag_next - one()) * desel(POW)
                         * (lhs_next - lhs))
    pow_squares = ((copy_flag_next - one()) * desel(POW) * (rhs_lsb - one())
                   * (result - result_next * result_next))
    pow_squares_mults = ((copy_flag_next - one()) * desel(POW) * rhs_lsb
                         * (result - result_next * result_next * lhs))

    popcount_inc = ((copy_flag_next - one()) * desel(POPCOUNT)
                    * (result - result_next - lhs_lsb))

    cf0_log_derivative_stays = ((copy_flag_next - one())
                                * (running_sum_log_derivative_next
                                   - running_sum_log_derivative))

    compressed_row_next = (challenge("U32CiWeight") * ci_next
                           + challenge("U32LhsWeight") * lhs_next
                           + challenge("U32RhsWeight") * rhs_next
                           + challenge("U32ResultWeight") * result_next)
    cf1_log_derivative_accumulates = copy_flag_next * (
        (running_sum_log_derivative_next - running_sum_log_derivative)
        * (challenge("U32Indeterminate") - compressed_row_next)
        - lookup_multiplicity_next)

    return [cf1_lhs_0_or_pow, cf1_rhs_0, cf0_ci_stays, cf0_lhs_bits_inc,
            cf0_rhs_bits_inc, cf0_lhs_lsb_is_bit, cf0_rhs_lsb_is_bit,
            lt_r0, lt_r1, lt_r2_lt0, lt_r2_lt1, lt_r2_unknown, lt_r2_copyflag,
            and_updates, log2floor_sets, log2floor_copies, pow_lhs_unchanged,
            pow_squares, pow_squares_mults, popcount_inc,
            cf0_log_derivative_stays, cf1_log_derivative_accumulates]


def terminal_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "u32", False)

    ci = main("CI")
    lhs = main("LHS")
    rhs = main("RHS")

    lhs_is_0_or_ci_is_pow = lhs * (ci - constant(POW))
    rhs_is_0 = rhs

    return [lhs_is_0_or_ci_is_pow, rhs_is_0]
