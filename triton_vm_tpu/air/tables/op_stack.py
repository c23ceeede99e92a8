"""Op-stack table AIR.

Transcribed from /root/reference/triton-air/src/table/op_stack.rs.
"""

from . import helpers

PADDING_VALUE = 2


def initial_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "op_stack", False)

    initial_stack_length = constant(16)
    padding_indicator = constant(PADDING_VALUE)

    stack_pointer_is_16 = main("StackPointer") - initial_stack_length

    compressed_row = (challenge("OpStackClkWeight") * main("CLK")
                      + challenge("OpStackIb1Weight") * main("IB1ShrinkStack")
                      + challenge("OpStackPointerWeight") * initial_stack_length
                      + challenge("OpStackFirstUnderflowElementWeight")
                      * main("FirstUnderflowElement"))
    rppa_initial = challenge("OpStackIndeterminate") - compressed_row
    rppa_has_accumulated_first_row = main_aux_rppa(aux) - rppa_initial
    rppa_is_default_initial = main_aux_rppa(aux) - constant(1)

    first_row_is_padding_row = main("IB1ShrinkStack") - padding_indicator
    first_row_is_not_padding_row = (main("IB1ShrinkStack")
                                    * (main("IB1ShrinkStack") - constant(1)))

    rppa_starts_correctly = (rppa_has_accumulated_first_row * first_row_is_padding_row
                             + rppa_is_default_initial * first_row_is_not_padding_row)

    clock_jump_diff_init = (
        aux("ClockJumpDifferenceLookupClientLogDerivative") - constant(0))

    return [stack_pointer_is_16, rppa_starts_correctly, clock_jump_diff_init]


def main_aux_rppa(aux):
    return aux("RunningProductPermArg")


def consistency_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "op_stack", False)

    def ib1():
        return main("IB1ShrinkStack")

    ib1_is_legal = ib1() * (ib1() - constant(1)) * (ib1() - constant(PADDING_VALUE))
    return [ib1_is_legal]


def transition_constraints(b):
    challenge, constant, x_constant, main, aux, next_main, next_aux = \
        helpers(b, "op_stack", True)

    one = constant(1)
    padding_indicator = constant(PADDING_VALUE)

    clk = main("CLK")
    ib1_shrink_stack = main("IB1ShrinkStack")
    stack_pointer = main("StackPointer")
    first_underflow_element = main("FirstUnderflowElement")
    rppa = aux("RunningProductPermArg")
    cjd_log_derivative = aux("ClockJumpDifferenceLookupClientLogDerivative")

    clk_next = next_main("CLK")
    ib1_shrink_stack_next = next_main("IB1ShrinkStack")
    stack_pointer_next = next_main("StackPointer")
    first_underflow_element_next = next_main("FirstUnderflowElement")
    rppa_next = next_aux("RunningProductPermArg")
    cjd_log_derivative_next = next_aux(
        "ClockJumpDifferenceLookupClientLogDerivative")

    stack_pointer_inc_or_same = ((stack_pointer_next - stack_pointer - one)
                                 * (stack_pointer_next - stack_pointer))

    underflow_or_growth = ((stack_pointer_next - stack_pointer - one)
                           * (first_underflow_element_next - first_underflow_element)
                           * ib1_shrink_stack_next)

    next_row_is_padding_row = ib1_shrink_stack_next - padding_indicator
    padding_propagates = (ib1_shrink_stack * (ib1_shrink_stack - one)
                          * next_row_is_padding_row)

    compressed_row = (challenge("OpStackClkWeight") * clk_next
                      + challenge("OpStackIb1Weight") * ib1_shrink_stack_next
                      + challenge("OpStackPointerWeight") * stack_pointer_next
                      + challenge("OpStackFirstUnderflowElementWeight")
                      * first_underflow_element_next)

    rppa_updates = rppa_next - rppa * (challenge("OpStackIndeterminate")
                                       - compressed_row)

    next_row_is_not_padding_row = (ib1_shrink_stack_next
                                   * (ib1_shrink_stack_next - one))
    rppa_remains = rppa_next - rppa
    rppa_updates_correctly = (rppa_updates * next_row_is_padding_row
                              + rppa_remains * next_row_is_not_padding_row)

    clk_diff = clk_next - clk
    log_derivative_accumulates = (
        (cjd_log_derivative_next - cjd_log_derivative)
        * (challenge("ClockJumpDifferenceLookupIndeterminate") - clk_diff) - one)
    log_derivative_remains = cjd_log_derivative_next - cjd_log_derivative

    ld_acc_or_sp_changes_or_padding = (
        log_derivative_accumulates * (stack_pointer_next - stack_pointer - one)
        * next_row_is_padding_row)
    ld_remains_or_sp_same = (log_derivative_remains
                             * (stack_pointer_next - stack_pointer))
    ld_remains_or_not_padding = log_derivative_remains * next_row_is_not_padding_row

    log_derivative_updates_correctly = (ld_acc_or_sp_changes_or_padding
                                        + ld_remains_or_sp_same
                                        + ld_remains_or_not_padding)

    return [stack_pointer_inc_or_same, underflow_or_growth, padding_propagates,
            rppa_updates_correctly, log_derivative_updates_correctly]


def terminal_constraints(b):
    return []
